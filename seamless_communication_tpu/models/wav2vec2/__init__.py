from seamless_communication_tpu.models.wav2vec2.encoder import (  # noqa: F401
    SpeechEncoderConfig,
    speech_encoder_init,
    speech_encoder_forward,
    stack_fbank_frames,
)
