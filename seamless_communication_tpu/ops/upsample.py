"""Static-shape duration-based upsampling (TPU replacement for torch
``repeat_interleave`` in the reference's HardUpsampling, length_regulator.py:21-39).

Data-dependent output lengths are re-expressed as a fixed ``max_out_len`` with an
explicit validity mask: output slot j reads source index  i(j) = #{k : ends[k] <= j}
where ends = cumsum(durations). The index computation is a (U, T) comparison reduce —
vectorized, no scatter/dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_upsample(x: jax.Array, durations: jax.Array, max_out_len: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Repeat each time step of ``x`` (B, T, D) by its integer duration (B, T).

    Returns (out (B, max_out_len, D) with invalid slots zeroed, out_lengths (B,)).
    """
    ends = jnp.cumsum(durations, axis=1)                       # (B, T)
    total = ends[:, -1]                                        # (B,)
    j = jnp.arange(max_out_len)                                # (U,)
    # i(j) = number of ends <= j  (clamped into range for the gather)
    idx = jnp.sum(ends[:, None, :] <= j[None, :, None], axis=-1)   # (B, U)
    idx = jnp.clip(idx, 0, x.shape[1] - 1)
    out = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    valid = j[None, :] < total[:, None]
    return out * valid[..., None].astype(x.dtype), total


def hard_upsample_ids(ids: jax.Array, durations: jax.Array, max_out_len: int,
                      pad_value: int = 0) -> tuple[jax.Array, jax.Array]:
    """Same as :func:`hard_upsample` for integer id sequences (B, T) -> (B, U)."""
    ends = jnp.cumsum(durations, axis=1)
    total = ends[:, -1]
    j = jnp.arange(max_out_len)
    idx = jnp.clip(jnp.sum(ends[:, None, :] <= j[None, :, None], axis=-1),
                   0, ids.shape[1] - 1)
    out = jnp.take_along_axis(ids, idx, axis=1)
    valid = j[None, :] < total[:, None]
    return jnp.where(valid, out, pad_value), total


def gaussian_upsample(x: jax.Array, durations: jax.Array, max_out_len: int, *,
                      delta: float = 0.1,
                      src_mask: jax.Array | None = None
                      ) -> tuple[jax.Array, jax.Array]:
    """Soft attention upsampling (reference GaussianUpsampling,
    length_regulator.py:42-96): out_j = sum_i softmax_i(-delta (j - c_i)^2) x_i
    with c_i = cumsum(d)_i - d_i/2 the duration midpoints and 0-based output
    positions j, exactly as the reference.

    ``src_mask`` (B, T) True=valid masks PADDED source positions only — a
    valid position with zero duration still receives weight (the reference
    masks by the padding mask, not by duration; the expressive EOS unit
    carries duration 0 and is attended). Defaults to durations > 0 when no
    mask is given."""
    d32 = durations.astype(jnp.float32)
    ends = jnp.cumsum(d32, axis=1)
    centers = ends - 0.5 * d32                                 # (B, T)
    total = ends[:, -1]
    j = jnp.arange(max_out_len, dtype=jnp.float32)             # 0-based positions
    energy = -delta * (j[None, :, None] - centers[:, None, :]) ** 2
    valid_src = (durations > 0) if src_mask is None else src_mask
    energy = jnp.where(valid_src[:, None, :], energy, -1e9)
    w = jax.nn.softmax(energy, axis=-1)                        # (B, U, T)
    out = jnp.einsum("but,btd->bud", w.astype(x.dtype), x)
    valid = j[None, :] < total[:, None]
    return out * valid[..., None].astype(x.dtype), total.astype(jnp.int32)
