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


def test_native_loader_batches(tmp_path):
    """Threaded C++ wav->fbank loader: file order, padding, lengths, parity with
    the python fbank, and corrupted-file handling (length 0)."""
    from seamless_communication_tpu.native import NativeFbankLoader

    rng = np.random.default_rng(0)
    paths, quantized = [], {}
    for i in range(7):
        n = int(16000 * (0.4 + 0.25 * i))
        wav = (0.1 * np.sin(2 * np.pi * (200 + 20 * i) * np.arange(n) / 16000)
               + 0.01 * rng.standard_normal(n)).astype(np.float32)
        p = tmp_path / f"{i}.wav"
        write_wav(str(p), wav, 16000)
        # the loader sees the PCM16 round-trip
        quantized[str(p)] = ((np.clip(wav, -1, 1) * 32767.0).astype(np.int16)
                             / 32768.0).astype(np.float32)
        paths.append(str(p))
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav at all")
    paths.insert(3, str(bad))

    loader = NativeFbankLoader(paths, batch_size=3, n_mels=80, bucket=64,
                               n_threads=4)
    idx = 0
    for fb, lens in loader:
        assert fb.shape[1] % 64 == 0
        for b in range(fb.shape[0]):
            if paths[idx] == str(bad):
                assert lens[b] == 0
            else:
                ref = fbank_numpy(quantized[paths[idx]])
                assert lens[b] == ref.shape[0]
                np.testing.assert_allclose(fb[b, :lens[b]], ref, atol=1e-4)
                assert np.all(fb[b, lens[b]:] == 0)
            idx += 1
    assert idx == len(paths)
    loader.close()


def test_native_loader_resamples(tmp_path):
    """Non-16k input is sinc-resampled in C++; frame count must match the python
    (scipy polyphase) path and features must agree closely."""
    scipy = pytest.importorskip("scipy")
    from seamless_communication_tpu.audio.wav import resample
    from seamless_communication_tpu.native import NativeFbankLoader

    rng = np.random.default_rng(1)
    n = int(22050 * 0.7)
    # broadband component keeps all mel bins above the log floor, where the two
    # resampler families (C++ windowed-sinc vs scipy polyphase) agree closely;
    # a pure tone would compare noise floors through the log instead
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(n) / 22050)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)
    p = tmp_path / "x22k.wav"
    write_wav(str(p), wav, 22050)
    q = ((np.clip(wav, -1, 1) * 32767.0).astype(np.int16) / 32768.0
         ).astype(np.float32)
    ref = fbank_numpy(resample(q, 22050, 16000))

    fb, lens = next(iter(NativeFbankLoader([str(p)], batch_size=1)))
    assert abs(int(lens[0]) - ref.shape[0]) <= 1
    L = min(int(lens[0]), ref.shape[0])
    # different resampler families: compare mean abs diff on log-mels
    assert float(np.abs(fb[0, :L] - ref[:L]).mean()) < 0.05


def test_native_spm_parity():
    """C++ unigram Viterbi (native/spm.cpp) must be byte-exact with the Python
    encoder across unknowns, byte fallback, CJK, and whitespace edge cases."""
    import random

    from seamless_communication_tpu.text.spm import (
        SentencePieceModel, build_spm_model, TYPE_BYTE, TYPE_CONTROL,
        TYPE_NORMAL, TYPE_UNKNOWN, TYPE_USER_DEFINED,
    )

    random.seed(0)
    pieces = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
              ("</s>", 0.0, TYPE_CONTROL)]
    pieces += [(f"<0x{b:02X}>", -20.0, TYPE_BYTE) for b in range(256)]
    syll = ["ab", "ba", "ca", "na", "to", "ri", "ku", "mi"]
    vocab = sorted({("▁" if i % 2 else "") + "".join(
        random.choice(syll) for _ in range(random.randint(1, 3)))
        for i in range(300)} | {"▁日本語", "日本", "語", "ø", "▁Ω"})
    pieces += [(w, -random.uniform(1, 12), TYPE_NORMAL) for w in vocab]
    pieces += [(",", -5.0, TYPE_USER_DEFINED)]

    spm = SentencePieceModel.from_bytes(build_spm_model(pieces))
    spm_py = SentencePieceModel.from_bytes(build_spm_model(pieces))
    spm_py._native_failed = True  # force the Python reference path

    words = [p.lstrip("▁") for p in vocab[:50]]
    texts = [" ".join(random.choice(words) for _ in range(random.randint(1, 10)))
             for _ in range(60)]
    texts += ["", " ", "unknown𝄞glyph", "日本語 mixed ascii", "ø Ω,",
              "\t tabs\nnewlines  "]
    for t in texts:
        assert spm.encode(t) == spm_py.encode(t), repr(t)
    if spm._native is None:
        pytest.skip("native library unavailable")
