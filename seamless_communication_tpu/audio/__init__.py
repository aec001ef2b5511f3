from seamless_communication_tpu.audio.fbank import (  # noqa: F401
    FbankConfig,
    fbank_numpy,
    fbank_jax,
    make_fbank_fn,
)
from seamless_communication_tpu.audio.wav import read_wav, write_wav  # noqa: F401
