"""Positional encodings.

Spec: fairseq1/M2M100-style sinusoidal table (half-sin | half-cos concatenated,
inverse-frequency ``exp(-log(10000) * i / (half_dim - 1))``), with fairseq's
padding-aware position ids (positions start at ``padding_idx + 1``; padded steps map to
``padding_idx`` whose table row is zero). This is the convention the reference
checkpoints were trained with (fairseq2 ``SinusoidalPositionEncoder``; serialized
directly as ``freqs`` by the reference's ggml converter, ggml_convert.py:384-393).

Also provides the Transformer-XL relative position table used by the v1 w2v-BERT
conformer attention (reference fairseq2.cpp:605-697 ``RelativePositionMHA_forward``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def sinusoidal_positions(num_positions: int, dim: int, *, padding_idx: Optional[int] = None,
                         dtype=jnp.float32) -> jax.Array:
    """(num_positions, dim) table: [sin | cos] halves, tensor2tensor/fairseq variant."""
    half = dim // 2
    inv_freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = jnp.arange(num_positions, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    table = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((num_positions, 1), jnp.float32)], axis=1)
    if padding_idx is not None:
        table = table.at[padding_idx].set(0.0)
    return table.astype(dtype)


def padded_position_ids(ids: jax.Array, padding_idx: int, *, past_length: int = 0) -> jax.Array:
    """fairseq ``make_positions``: non-pad tokens get ``padding_idx + 1 + running_count``;
    pad tokens stay at ``padding_idx``."""
    mask = (ids != padding_idx).astype(jnp.int32)
    pos = (jnp.cumsum(mask, axis=1) + past_length) * mask
    return pos + padding_idx


def apply_sinusoidal_pos(x: jax.Array, *, padding_mask: Optional[jax.Array] = None,
                         padding_idx: int = 1, start_step: int | jax.Array = 0
                         ) -> jax.Array:
    """Add sinusoidal positions to (B, T, D) embeddings.

    Positions are fairseq-convention: ``padding_idx + 1 + t`` for valid step ``t``
    (table offset of ``padding_idx + 1``). ``start_step`` supports incremental decode.
    """
    B, T, D = x.shape
    # compute only the T needed rows directly — building the full max_len table
    # (4096x1024 fp32) per decode step showed up at ~0.06 ms/step in traces
    steps = jnp.arange(T) + start_step + padding_idx + 1
    half = D // 2
    inv_freq = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                       * (-math.log(10000.0) / (half - 1)))
    ang = steps.astype(jnp.float32)[:, None] * inv_freq[None, :]
    pos = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    if D % 2 == 1:
        pos = jnp.concatenate([pos, jnp.zeros((T, 1), jnp.float32)], axis=1)
    pos = jnp.where((steps == padding_idx)[:, None], 0.0, pos).astype(x.dtype)
    if padding_mask is not None:
        pos = pos[None] * padding_mask[..., None].astype(x.dtype)
    return x + pos


def xl_relative_position_table(seq_len: int, dim: int, *, dtype=jnp.float32) -> jax.Array:
    """(2*seq_len - 1, dim) table of sinusoidal encodings of relative distances
    d = -(S-1) .. (S-1), row k encoding d = k - (S-1).

    Matches the reference layout where distance d indexes the absolute sinusoidal table
    at row ``n_ctx + d - 1`` (fairseq2.cpp:626-637 with rows [n_ctx-S, n_ctx+S-1)); here
    we compute the angles directly with position value ``p = n_ctx + d - 1`` replaced by
    the equivalent shift-invariant ``p = d`` offset — the table is regenerated at load
    time from the checkpoint's absolute table when bit-parity is required.
    """
    half = dim // 2
    inv_freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    d = jnp.arange(-(seq_len - 1), seq_len, dtype=jnp.float32)[:, None]
    ang = d * inv_freq[None, :]
    table = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=1)
    return table.astype(dtype)
