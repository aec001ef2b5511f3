"""fbank parity vs the HF SeamlessM4TFeatureExtractor (checkpoint-validated spec of
the reference's WaveformToFbankConverter, inference/translator.py:136-146)."""

import numpy as np
import pytest

from tests.conftest import assert_close

from seamless_communication_tpu.audio.fbank import (
    FbankConfig, fbank_jax, fbank_numpy, make_fbank_fn, num_frames,
)
from seamless_communication_tpu.audio.wav import read_wav, resample, write_wav


@pytest.fixture(scope="module")
def wave_1s(rng=None):
    rng = np.random.default_rng(7)
    t = np.arange(16000) / 16000.0
    sig = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.1 * np.sin(2 * np.pi * 1333 * t)
           + 0.02 * rng.standard_normal(16000))
    return sig.astype(np.float32)


def test_fbank_numpy_matches_hf(wave_1s):
    from transformers import SeamlessM4TFeatureExtractor
    fe = SeamlessM4TFeatureExtractor()
    ref = fe._extract_fbank_features(wave_1s)
    got = fbank_numpy(wave_1s)
    assert got.shape == ref.shape
    assert_close(got, ref, atol=1e-3, rtol=1e-4)


def test_fbank_jax_matches_numpy(wave_1s):
    T = num_frames(len(wave_1s))
    got = np.asarray(fbank_jax(wave_1s, max_frames=T))
    ref = fbank_numpy(wave_1s)
    assert_close(got, ref, atol=2e-3, rtol=1e-3)


def test_fbank_batched_masks_padding(wave_1s):
    fn = make_fbank_fn(max_frames=120)
    wavs = np.stack([wave_1s, np.pad(wave_1s[:8000], (0, 8000))])
    lens = np.array([16000, 8000])
    feats, flens = fn(wavs, lens)
    assert feats.shape == (2, 120, 80)
    assert int(flens[0]) == 98 and int(flens[1]) == 48
    assert np.all(np.asarray(feats)[1, 48:] == 0.0)


def test_wav_roundtrip(tmp_path, wave_1s):
    p = str(tmp_path / "x.wav")
    write_wav(p, wave_1s, 16000)
    back, rate = read_wav(p)
    assert rate == 16000
    assert_close(back, wave_1s, atol=2e-4, rtol=1)


def test_resample_lengths(wave_1s):
    y = resample(wave_1s, 16000, 8000)
    assert abs(len(y) - 8000) <= 1
