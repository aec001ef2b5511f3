from seamless_communication_tpu.inference.generator import (  # noqa: F401
    SequenceGeneratorOptions,
    UnitYGenerator,
)
from seamless_communication_tpu.inference.translator import (  # noqa: F401
    Task,
    Modality,
    Translator,
    BatchedSpeechOutput,
)
