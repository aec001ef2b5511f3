"""Kaldi-compatible 80-mel log filterbank extraction.

Replaces the reference's fairseq2 ``WaveformToFbankConverter`` / vendored
kaldi-native-fbank C++ (reference ggml/examples/kaldi-native-fbank/csrc, 5.2k LoC;
used at inference/translator.py:136-146).

Spec (validated against the HF SeamlessM4TFeatureExtractor numerics):
  - waveform scaled by 2**15 (16-bit-int compliance)
  - 25 ms window / 10 ms hop @ 16 kHz (400/160 samples), no centering
  - per-frame DC-offset removal, pre-emphasis 0.97 (edge-replicated), povey window
  - 512-point real FFT -> power spectrum (257 bins)
  - kaldi-mel triangular filters, 20 Hz .. nyquist, triangularized in mel space, no norm
  - natural log with floor 1.1921e-7

Two implementations:
  - ``fbank_numpy``: exact host-side reference (data prep, tests)
  - ``fbank_jax``:   TPU version — framing by gather, DFT **as a matmul** on the MXU
                     (frames @ real/imag DFT bases), mel projection as a second matmul.
                     Static output length; jit/pjit friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp

MEL_FLOOR = 1.192092955078125e-07


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    num_mel_bins: int = 80
    frame_length: int = 400      # 25 ms
    hop_length: int = 160        # 10 ms
    fft_length: int = 512
    preemphasis: float = 0.97
    low_freq: float = 20.0
    waveform_scale: float = 2.0 ** 15


def povey_window(n: int) -> np.ndarray:
    """Kaldi 'povey' window: hann^0.85, non-periodic."""
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return hann ** 0.85


def kaldi_mel_filters(num_freq_bins: int, num_mel: int, sample_rate: int,
                      low_freq: float, high_freq: float) -> np.ndarray:
    """(num_freq_bins, num_mel) triangular filters built in mel space (kaldi scale
    1127*ln(1+f/700), no area normalization)."""
    def hz_to_mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    mel_lo, mel_hi = hz_to_mel(low_freq), hz_to_mel(high_freq)
    mel_pts = np.linspace(mel_lo, mel_hi, num_mel + 2)
    fft_hz = np.arange(num_freq_bins) * sample_rate / ((num_freq_bins - 1) * 2)
    fft_mel = hz_to_mel(fft_hz)
    left, center, right = mel_pts[:-2], mel_pts[1:-1], mel_pts[2:]
    up = (fft_mel[:, None] - left[None, :]) / (center - left)[None, :]
    down = (right[None, :] - fft_mel[:, None]) / (right - center)[None, :]
    return np.maximum(0.0, np.minimum(up, down)).astype(np.float64)


def num_frames(num_samples: int, cfg: FbankConfig = FbankConfig()) -> int:
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.hop_length


# ---------------------------------------------------------------------------
# numpy reference
# ---------------------------------------------------------------------------

def fbank_numpy(waveform: np.ndarray, cfg: FbankConfig = FbankConfig()) -> np.ndarray:
    """(num_samples,) float waveform in [-1, 1] -> (frames, num_mel_bins) fp32 log-mel."""
    x = np.asarray(waveform, np.float64) * cfg.waveform_scale
    T = num_frames(len(x), cfg)
    idx = np.arange(cfg.frame_length)[None, :] + cfg.hop_length * np.arange(T)[:, None]
    frames = x[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)               # remove DC
    shifted = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)  # edge-replicate
    frames = frames - cfg.preemphasis * shifted
    frames = frames * povey_window(cfg.frame_length)[None, :]
    spec = np.fft.rfft(frames, n=cfg.fft_length, axis=1)
    power = np.abs(spec) ** 2
    mel_f = kaldi_mel_filters(cfg.fft_length // 2 + 1, cfg.num_mel_bins,
                              cfg.sample_rate, cfg.low_freq, cfg.sample_rate / 2)
    mel = np.maximum(power @ mel_f, MEL_FLOOR)
    return np.log(mel).astype(np.float32)


# ---------------------------------------------------------------------------
# JAX / TPU version
# ---------------------------------------------------------------------------

@lru_cache(maxsize=4)
def _dft_and_mel_bases(cfg: FbankConfig):
    """Fused (frame_length, 2*num_freq_bins) windowed-DFT basis and mel matrix.

    DFT as matmul: for 400-sample frames and 257 output bins this is a
    (T, 400) @ (400, 514) matmul — ideal MXU work, no FFT primitive needed.
    The povey window is folded into the basis.
    """
    n, nfft = cfg.frame_length, cfg.fft_length
    bins = nfft // 2 + 1
    t = np.arange(n)[:, None]
    k = np.arange(bins)[None, :]
    ang = -2.0 * np.pi * t * k / nfft
    win = povey_window(n)[:, None]
    basis = np.concatenate([np.cos(ang) * win, np.sin(ang) * win], axis=1)  # (n, 2*bins)
    mel_f = kaldi_mel_filters(bins, cfg.num_mel_bins, cfg.sample_rate,
                              cfg.low_freq, cfg.sample_rate / 2)
    # keep as numpy: this function is lru_cached and may be first called inside a
    # jit trace — caching device arrays created there would leak tracers
    return basis.astype(np.float32), mel_f.astype(np.float32)


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def fbank_jax(waveform: jax.Array, *, cfg: FbankConfig = FbankConfig(),
              max_frames: int) -> jax.Array:
    """(num_samples,) -> (max_frames, num_mel_bins) fp32 log-mel with static shape.

    The caller pads ``waveform`` to ``(max_frames - 1) * hop + frame_length`` samples
    and masks invalid trailing frames via the frame count from ``num_frames``.
    """
    x = waveform.astype(jnp.float32) * cfg.waveform_scale
    need = (max_frames - 1) * cfg.hop_length + cfg.frame_length
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    else:
        x = x[:need]
    starts = cfg.hop_length * jnp.arange(max_frames)
    idx = starts[:, None] + jnp.arange(cfg.frame_length)[None, :]
    frames = x[idx]                                                   # (F, n)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    shifted = jnp.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - cfg.preemphasis * shifted
    basis, mel_f = _dft_and_mel_bases(cfg)
    # fp32 multiplies: TPU matmuls default to bf16 inputs, which loses ~16%
    # relative accuracy on the heavily-cancelling DFT
    hi = jax.lax.Precision.HIGHEST
    spec = jnp.matmul(frames, basis, preferred_element_type=jnp.float32,
                      precision=hi)  # (F, 2*bins)
    bins = cfg.fft_length // 2 + 1
    power = jnp.square(spec[:, :bins]) + jnp.square(spec[:, bins:])
    mel = jnp.maximum(jnp.matmul(power, mel_f, preferred_element_type=jnp.float32,
                                 precision=hi),
                      MEL_FLOOR)
    return jnp.log(mel)


def make_fbank_fn(max_frames: int, cfg: FbankConfig = FbankConfig()):
    """Batched fbank: (B, samples) + (B,) sample counts -> (B, max_frames, mel),
    (B,) frame lengths."""

    @jax.jit
    def fn(waveforms: jax.Array, sample_lengths: jax.Array):
        feats = jax.vmap(lambda w: fbank_jax(w, cfg=cfg, max_frames=max_frames))(waveforms)
        frame_lens = jnp.where(
            sample_lengths < cfg.frame_length, 0,
            1 + (sample_lengths - cfg.frame_length) // cfg.hop_length)
        frame_lens = jnp.minimum(frame_lens, max_frames)
        mask = jnp.arange(max_frames)[None, :] < frame_lens[:, None]
        return feats * mask[..., None], frame_lens

    return fn


def normalize_per_mel_bin(feats: np.ndarray) -> np.ndarray:
    """HF-style per-mel-bin zero-mean/unit-var normalization over the utterance
    (feature_extraction_seamless_m4t do_normalize_per_mel_bins)."""
    mean = feats.mean(axis=0, keepdims=True)
    std = feats.std(axis=0, keepdims=True)
    return ((feats - mean) / (std + 1e-7)).astype(np.float32)
