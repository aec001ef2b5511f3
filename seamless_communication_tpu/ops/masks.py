"""Padding / attention mask utilities.

The reference (fairseq2) carries a ``PaddingMask`` object of per-sequence lengths with
materialization on demand. On TPU we standardize on **static-shape boolean masks**
(True = valid position) derived from integer length vectors, and additive fp32 bias
masks for attention logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # finite large-negative; avoids NaN from (-inf) - (-inf) in softmax paths


def lengths_to_padding_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) int lengths -> (B, max_len) bool mask, True where valid."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return pos < lengths[:, None]


def mask_to_lengths(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def causal_mask(length: int, dtype=jnp.float32) -> jax.Array:
    """(length, length) additive bias: 0 on/below diag, NEG_INF above."""
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)


def padding_bias(key_mask: Optional[jax.Array], dtype=jnp.float32) -> Optional[jax.Array]:
    """(B, S) bool key mask -> (B, 1, 1, S) additive bias for attention logits."""
    if key_mask is None:
        return None
    return jnp.where(key_mask[:, None, None, :], 0.0, NEG_INF).astype(dtype)


def combine_masks(*biases: Optional[jax.Array]) -> Optional[jax.Array]:
    """Sum additive attention biases, ignoring Nones."""
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out


def apply_padding_mask(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """Zero padded time steps of (B, T, D) activations given a (B, T) bool mask."""
    if mask is None:
        return x
    return x * mask[..., None].astype(x.dtype)
