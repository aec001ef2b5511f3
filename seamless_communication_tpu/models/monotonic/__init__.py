from seamless_communication_tpu.models.monotonic.model import (  # noqa: F401
    MonotonicDecoderConfig,
    monotonic_decoder_init,
    monotonic_decode_step,
    monotonic_decoder_cache,
)
