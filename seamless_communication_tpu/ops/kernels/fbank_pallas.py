"""Fused log-mel fbank as a single Pallas TPU kernel.

Replaces the chain frame-gather -> windowed-DFT matmul -> power -> mel matmul -> log
(audio/fbank.py fbank_jax) with one VMEM-resident kernel per frame block: framing by
reshape (hop=160 divides the 400-sample window into 2.5 hop-rows, so three shifted
row views concatenate into the frame matrix — no gathers), both matmuls back-to-back
on the MXU without HBM round-trips, pointwise power/log fused in between.

Grid: one program per block of 128 frames; the waveform stays in VMEM (10 s of
16 kHz audio is 640 KB).

Numerics: matmuls use a manual bf16x3 decomposition (_dot3) since Mosaic's in-kernel
dot only supports DEFAULT precision. Measured vs the fp64 numpy reference on real
v5e: <= 5e-3 max log-mel error on broadband/speech signals; pure tones can deviate
more in NEAR-FLOOR bins only (cancellation below the mel floor), which utterance
normalization and bf16 model inputs make irrelevant downstream.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from seamless_communication_tpu.audio.fbank import (
    MEL_FLOOR, kaldi_mel_filters, povey_window,
)

FRAME_BLOCK = 128
FRAME_LEN = 400
HOP = 160
NFFT = 512
BINS = NFFT // 2 + 1          # 257
BINS_PAD = 384                # lane-aligned padding for the [cos|sin] halves
MEL_PAD = 128


@lru_cache(maxsize=2)
def _bases(num_mel: int, sample_rate: int):
    n = FRAME_LEN
    t = np.arange(n)[:, None]
    k = np.arange(BINS)[None, :]
    ang = -2.0 * np.pi * t * k / NFFT
    win = povey_window(n)[:, None]
    basis = np.zeros((n, 2 * BINS_PAD), np.float32)   # [cos | sin]
    basis[:, :BINS] = np.cos(ang) * win
    basis[:, BINS_PAD:BINS_PAD + BINS] = np.sin(ang) * win
    mel = np.zeros((BINS_PAD, MEL_PAD), np.float32)
    mel[:BINS, :num_mel] = kaldi_mel_filters(BINS, num_mel, sample_rate, 20.0,
                                             sample_rate / 2)
    return basis, mel


def _dot3(a: jax.Array, b: jax.Array) -> jax.Array:
    """fp32-accurate matmul via manual bf16x3 decomposition (Mosaic's dot supports
    only DEFAULT precision in-kernel, which rounds inputs to bf16 — the DFT cancels
    heavily and loses ~16% relative accuracy at default precision):
    a@b = a_hi@b_hi + a_hi@b_lo + a_lo@b_hi with x_hi = bf16(x), x_lo = x - x_hi."""
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a - a_hi
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    b_lo = b - b_hi
    f32 = jnp.float32
    return (jnp.dot(a_hi, b_hi, preferred_element_type=f32)
            + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
            + jnp.dot(a_lo, b_hi, preferred_element_type=f32))


def _kernel(wav_ref, basis_ref, mel_ref, out_ref):
    """Mosaic-friendly framing: the (128, 400)-frame x basis matmul is decomposed
    into three hop-block matmuls (160+160+80 columns), avoiding lane-misaligned
    concatenations. Per block, preemphasis is a lane roll with a carry column from
    the previous block; DC removal folds into a -0.03*mean*colsum(basis) term
    (preemph of a constant is 0.03x everywhere incl. the edge-replicated head)."""
    r0 = wav_ref[0, 0:FRAME_BLOCK, :] * 32768.0                          # (128,160)
    r1 = wav_ref[0, 1:FRAME_BLOCK + 1, :] * 32768.0
    r2 = wav_ref[0, 2:FRAME_BLOCK + 2, :] * 32768.0
    tail = FRAME_LEN - 2 * HOP                                           # 80

    mean = (jnp.sum(r0, axis=1, keepdims=True) + jnp.sum(r1, axis=1, keepdims=True)
            + jnp.sum(r2[:, :tail], axis=1, keepdims=True)) / FRAME_LEN

    col0 = jax.lax.broadcasted_iota(jnp.int32, (FRAME_BLOCK, HOP), 1) == 0

    def preemph(x, carry):
        rolled = pltpu.roll(x, 1, 1)
        prev = jnp.where(col0[:, :x.shape[1]], carry, rolled)
        return x - 0.97 * prev

    p0 = preemph(r0, r0[:, :1])              # frame head: edge-replicated
    p1 = preemph(r1, r0[:, -1:])
    p2 = preemph(r2, r1[:, -1:])[:, :tail]

    b = basis_ref[:]
    spec = (_dot3(p0, b[0:HOP])
            + _dot3(p1, b[HOP:2 * HOP])
            + _dot3(p2, b[2 * HOP:FRAME_LEN]))
    # subtract DC: preemph(mean * ones) = 0.03 * mean at every position
    colsum = jnp.sum(b, axis=0, keepdims=True)                           # (1, 2*BINS)
    spec = spec - (0.03 * mean) * colsum

    power = jnp.square(spec[:, :BINS_PAD]) + jnp.square(spec[:, BINS_PAD:])
    mel = _dot3(power, mel_ref[:])
    out_ref[:] = jnp.log(jnp.maximum(mel, MEL_FLOOR))


@partial(jax.jit, static_argnames=("max_frames", "num_mel", "sample_rate",
                                   "interpret"))
def fbank_pallas(waveform: jax.Array, *, max_frames: int, num_mel: int = 80,
                 sample_rate: int = 16000, interpret: bool = False) -> jax.Array:
    """(num_samples,) float32 -> (max_frames, num_mel) log-mel, one fused kernel.
    ``max_frames`` must be a multiple of FRAME_BLOCK (pad + mask at the caller)."""
    assert max_frames % FRAME_BLOCK == 0
    n_blocks = max_frames // FRAME_BLOCK
    n_rows = max_frames + 2                     # covers the +2 row lookahead
    need = n_rows * HOP
    x = waveform.astype(jnp.float32)
    if x.shape[0] < need:
        x = jnp.pad(x, (0, need - x.shape[0]))
    else:
        x = x[:need]
    rows = x.reshape(n_rows, HOP)
    # overlapping per-block row windows (130 rows per 128-frame block): lets the
    # kernel use only STATIC slices (Mosaic rejects dynamic sublane offsets here);
    # duplication overhead is 2/130 ≈ 1.5%
    idx = (jnp.arange(n_blocks)[:, None] * FRAME_BLOCK
           + jnp.arange(FRAME_BLOCK + 2)[None, :])
    blocks = rows[idx]                          # (n_blocks, 130, 160)

    basis, mel = _bases(num_mel, sample_rate)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((max_frames, MEL_PAD), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, FRAME_BLOCK + 2, HOP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # DFT basis
            pl.BlockSpec(memory_space=pltpu.VMEM),   # mel matrix
        ],
        out_specs=pl.BlockSpec((FRAME_BLOCK, MEL_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(blocks, jnp.asarray(basis), jnp.asarray(mel))
    return out[:, :num_mel]
