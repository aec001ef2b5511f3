from seamless_communication_tpu.models.nllb.model import (  # noqa: F401
    NllbConfig,
    text_encoder_init,
    text_encoder_forward,
    text_decoder_init,
    text_decoder_forward,
    text_decoder_step,
)
