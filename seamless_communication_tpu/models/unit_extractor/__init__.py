from seamless_communication_tpu.models.unit_extractor.unit_extractor import (  # noqa: F401
    UnitExtractor, KmeansModel,
)
from seamless_communication_tpu.models.unit_extractor.wav2vec2_raw import (  # noqa: F401
    Wav2Vec2RawConfig, wav2vec2_raw_init, wav2vec2_layer_output,
)
