from seamless_communication_tpu.models.vocoder.hifigan import (  # noqa: F401
    HifiGanConfig, hifigan_init, hifigan_forward,
)
from seamless_communication_tpu.models.vocoder.codehifigan import (  # noqa: F401
    CodeHifiGanConfig, code_hifigan_init, code_hifigan_forward,
)
