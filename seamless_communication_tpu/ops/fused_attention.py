"""Fused (flash) full-sequence attention for TPU training / encoding.

The XLA softmax-attention path materializes the (B, H, Tq, Tk) f32 logits AND
probs tensors in HBM per layer-pass (~2 GB/layer on the batch-32 medium train
step); the Pallas TPU flash kernel
(`jax.experimental.pallas.ops.tpu.flash_attention`) streams them through VMEM
tiles with an f32 online softmax and a custom VJP, so only the additive bias
tile (`ab`, when present) ever lives in HBM.

This wrapper adapts the repo's `_sdpa` contract to the kernel:
  - q is pre-scaled (kernel called with sm_scale=1), matching
    ``logits = qk*scale + extra_logits + bias``.
  - A pure key-padding bias (B, 1, 1, Tk) becomes segment ids — no ab
    materialization at all for the common padded-batch case.
  - Anything else additive (Shaw/XL relative-position logits, causal+padding
    combinations) is folded into one bf16 ab tensor.
  - Sequence lengths are zero-padded to the kernel's 128 blocks; padded keys
    are excluded via segment ids, padded query rows are sliced off.

Gating (``SEAMLESS_FUSED_ATTN``: 0|1|auto, default OFF): measured on v5e at
the medium train shape (B=32, T=500, Dh=64), the fused path was parity-exact
at bf16 tolerance but NET SLOWER — 937 vs 784 ms/step — because the XL/Shaw
relative-position bias must still materialize as a padded bf16 ``ab`` tensor
and the Dh=64 head wastes half the kernel's 128 lanes, while XLA's own
softmax fusion already avoids one of the two (B,H,T,T) round-trips. Kept
opt-in for bias-free workloads and future head-dim-128 models; "auto"
enables it on TPU backends only.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

_MASK_THRESHOLD = -1e8   # biases at/below this mean "masked"


def _enabled() -> bool:
    v = os.environ.get("SEAMLESS_FUSED_ATTN", "0").lower()
    if v in ("0", "off", "false"):
        return False
    if v in ("1", "on", "true"):
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing
        return False


def try_flash(q: jax.Array, k: jax.Array, v: jax.Array,
              bias: Optional[jax.Array], extra_logits: Optional[jax.Array],
              scale: float) -> Optional[jax.Array]:
    """Flash-attention for ``_sdpa(q, k, v, bias, extra_logits, scale)``.

    Returns the (B, H, Tq, Dh) output in v.dtype, or None when the fused
    path is ineligible (non-TPU backend, tiny sequences, odd bias ranks) —
    callers fall back to the XLA composition.
    """
    if not _enabled():
        return None
    if q.ndim != 4 or q.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    B, H, Tq, Dh = q.shape
    Tk = k.shape[2]
    if min(Tq, Tk) < 128:
        return None
    if bias is not None and bias.ndim != 4:
        return None

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention,
    )

    kv_valid = None
    if (bias is not None and extra_logits is None
            and bias.shape[1] == 1 and bias.shape[2] == 1):
        # pure key-padding bias -> segment ids, no ab materialization
        kv_valid = bias[:, 0, 0, :] > _MASK_THRESHOLD        # (B, Tk)
        bias = None

    ab = None
    if extra_logits is not None or bias is not None:
        abf = None
        if extra_logits is not None:
            abf = extra_logits.astype(jnp.float32)
        if bias is not None:
            b32 = bias.astype(jnp.float32)
            abf = b32 if abf is None else abf + b32
        ab = jnp.broadcast_to(abf, (B, H, Tq, Tk)).astype(q.dtype)

    pad_q = (-Tq) % 128
    pad_k = (-Tk) % 128
    qs = (q * scale).astype(q.dtype)
    if pad_q:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    kp, vp = k, v
    if pad_k:
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    if ab is not None and (pad_q or pad_k):
        ab = jnp.pad(ab, ((0, 0), (0, 0), (0, pad_q), (0, pad_k)))

    seg = None
    if kv_valid is not None or pad_k:
        if kv_valid is None:
            kv_seg = jnp.ones((B, Tk), jnp.int32)
        else:
            kv_seg = kv_valid.astype(jnp.int32)
        if pad_k:
            kv_seg = jnp.pad(kv_seg, ((0, 0), (0, pad_k)))
        q_seg = jnp.ones((B, Tq + pad_q), jnp.int32)
        seg = SegmentIds(q=q_seg, kv=kv_seg)

    out = flash_attention(qs, kp, vp, ab=ab, segment_ids=seg, sm_scale=1.0)
    if pad_q:
        out = out[:, :, :Tq]
    return out.astype(v.dtype)
