from seamless_communication_tpu.checkpoint.convert_hf import (  # noqa: F401
    convert_hf_seamless_m4t_v2,
    convert_hf_code_hifigan,
)
