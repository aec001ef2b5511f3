"""Native C++ fbank/WAV parity vs the numpy reference implementations."""

import numpy as np
import pytest

from seamless_communication_tpu.audio.fbank import fbank_numpy
from seamless_communication_tpu.audio.wav import write_wav
from seamless_communication_tpu.native import fbank_native, get_lib, wav_decode_native


pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def sig():
    rng = np.random.default_rng(3)
    t = np.arange(16000) / 16000.0
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(16000)).astype(np.float32)


def test_native_fbank_parity(sig):
    ref = fbank_numpy(sig)
    got = fbank_native(sig)
    assert got is not None and got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-4)


def test_native_wav_decode(tmp_path, sig):
    p = tmp_path / "x.wav"
    write_wav(str(p), sig, 16000)
    got = wav_decode_native(p.read_bytes())
    assert got is not None
    wav, rate = got
    assert rate == 16000
    np.testing.assert_allclose(wav, sig, atol=2e-4)
