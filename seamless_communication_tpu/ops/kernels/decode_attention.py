"""Fused beam-gather + KV-row-insert + causal decode attention (Pallas/TPU).

One decode step of int8-KV self-attention does, per layer:

  1. gather the (B,H,T,Dh) KV cache by the beam-origin permutation ``src``
  2. write the current token's quantized K/V row at position ``step``
  3. read the whole cache again for the attention contraction

Expressed as XLA ops (gather + select + einsums) this costs ~2.5 passes over
the cache plus fp32 VPU chains — profiled at ~1.3 ms of a 2.9 ms v2-large
decode step (docs/performance.md). This kernel does all three in ONE pass:
each grid program DMAs its source beam's cache block into VMEM (the gather is
the mandatory read), computes the attention on-chip, and writes the updated
block out exactly once.

Numerics follow ops/attention.py self_attention_step_nocache_int8: history
logits are (q . k_int8) * k_scale with fp32 accumulation; the CURRENT token's
logit/value use the unquantized row; softmax in fp32. The quantized current
row is stored with ops/attention.py quantize_kv_rows semantics.

Reference counterpart: fairseq2's IncrementalStateBag attention reads
(fairseq2 attention.py); re-designed here for the TPU memory system.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG = -1e9


def _reference(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale, step, src):
    """Pure-JAX reference (and CPU fallback): gather + select + attention,
    math-identical to the kernel. Shapes: q/k_t/v_t (B,H,Dh); caches
    (B,H,T,Dh) int8; scales (B,H,T) f32; src (B,) int32."""
    from seamless_communication_tpu.ops.attention import quantize_kv_rows

    dtype = q.dtype
    T = k_cache.shape[2]
    dh = q.shape[-1]
    k_cache, v_cache = k_cache[src], v_cache[src]
    k_scale, v_scale = k_scale[src], v_scale[src]

    logits = jnp.einsum("bhd,bhtd->bht", q, k_cache.astype(dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * k_scale / math.sqrt(dh)
    lcur = jnp.einsum("bhd,bhd->bh", q, k_t,
                      preferred_element_type=jnp.float32) / math.sqrt(dh)
    t = jnp.arange(T)[None, None, :]
    valid = t < step
    logits = jnp.where(valid, logits, NEG)
    m = jnp.maximum(jnp.max(logits, axis=-1), lcur)
    p = jnp.where(valid, jnp.exp(logits - m[..., None]), 0.0)
    pc = jnp.exp(lcur - m)
    den = jnp.sum(p, axis=-1) + pc
    out = jnp.einsum("bht,bhtd->bhd", (p * v_scale).astype(dtype),
                     v_cache.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = (out + pc[..., None] * v_t.astype(jnp.float32)) / den[..., None]

    kq, ks = quantize_kv_rows(k_t)
    vq, vs = quantize_kv_rows(v_t)
    is_cur = t == step
    new_k = jnp.where(is_cur[..., None], kq[:, :, None, :], k_cache)
    new_v = jnp.where(is_cur[..., None], vq[:, :, None, :], v_cache)
    new_ks = jnp.where(is_cur, ks[:, :, None], k_scale)
    new_vs = jnp.where(is_cur, vs[:, :, None], v_scale)
    return out.astype(dtype), new_k, new_v, new_ks, new_vs


def _kernel(step_ref, src_ref, q_ref, kt_ref, vt_ref, kc_ref, vc_ref,
            ks_ref, vs_ref, out_ref, nkc_ref, nvc_ref, nks_ref, nvs_ref,
            *, dh: int):
    from jax.experimental import pallas as pl

    step = step_ref[0]
    q = q_ref[0]                       # (H, Dh) model dtype
    dtype = q.dtype
    kc = kc_ref[0]                     # (H, T, Dh) int8 (gathered by index_map)
    vc = vc_ref[0]
    ks = ks_ref[0]                     # (H, T) f32
    vs = vs_ref[0]
    H, T, _ = kc.shape

    # current-row quantization (quantize_kv_rows semantics)
    ktf = kt_ref[0].astype(jnp.float32)
    vtf = vt_ref[0].astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(ktf), axis=-1) / 127.0, 1e-8)   # (H,)
    sv = jnp.maximum(jnp.max(jnp.abs(vtf), axis=-1) / 127.0, 1e-8)
    # keep the quantized rows in f32: Mosaic only supports minor-dim
    # insertion/broadcast on 32-bit vectors; cast to int8 at the final store
    k8f = jnp.clip(jnp.round(ktf / sk[:, None]), -127, 127)          # (H, Dh)
    v8f = jnp.clip(jnp.round(vtf / sv[:, None]), -127, 127)

    # history logits (H,T): Mosaic has no batched dot — unroll the H loop
    # with 2D dots contracting Dh (no in-kernel transposes)
    logits = jnp.concatenate([
        jax.lax.dot_general(q[h:h + 1], kc[h].astype(dtype),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                                   # (H, T)
    logits = logits * ks / math.sqrt(dh)
    # f32 products == the MXU's exact bf16xbf16->f32 semantics of the XLA
    # path's preferred_element_type=f32 einsum (bf16 values are exact in f32)
    lcur = jnp.sum(q.astype(jnp.float32) * ktf, axis=-1) / math.sqrt(dh)

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (H, T), 1)
    valid = t_iota < step
    logits = jnp.where(valid, logits, NEG)
    m = jnp.maximum(jnp.max(logits, axis=-1), lcur)                   # (H,)
    p = jnp.where(valid, jnp.exp(logits - m[:, None]), 0.0)
    pc = jnp.exp(lcur - m)
    den = jnp.sum(p, axis=-1) + pc

    p2 = (p * vs).astype(dtype)
    out = jnp.concatenate([
        jax.lax.dot_general(p2[h:h + 1], vc[h].astype(dtype),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                                   # (H, Dh)
    out = (out + pc[:, None] * vtf) / den[:, None]
    out_ref[0] = out.astype(dtype)

    # one-pass write-back: gathered block with the new row selected in.
    # Mosaic can't reshape/minor-insert 8-bit vectors or prove alignment for
    # a dynamic single-row store, so the select is staged through f32 (the
    # wrapper's VMEM guard accounts for the staging and falls back to the XLA
    # path for long caches).
    is_cur = t_iota == step
    is_cur3 = jax.lax.broadcasted_iota(jnp.int32, kc.shape, 1) == step
    nkc_ref[0] = jnp.where(is_cur3, k8f[:, None, :],
                           kc.astype(jnp.float32)).astype(jnp.int8)
    nvc_ref[0] = jnp.where(is_cur3, v8f[:, None, :],
                           vc.astype(jnp.float32)).astype(jnp.int8)
    nks_ref[0] = jnp.where(is_cur, sk[:, None], ks)
    nvs_ref[0] = jnp.where(is_cur, sv[:, None], vs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_call(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                 step_arr, src, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, Dh = k_cache.shape

    def vec_idx(b, step_r, src_r):
        return (b, 0, 0)

    def gath_idx(b, step_r, src_r):
        return (src_r[b], 0, 0, 0)

    def gath_idx3(b, step_r, src_r):
        return (src_r[b], 0, 0)

    def out_idx(b, step_r, src_r):
        return (b, 0, 0, 0)

    def out_idx3(b, step_r, src_r):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, T, Dh), gath_idx),
            pl.BlockSpec((1, H, T, Dh), gath_idx),
            pl.BlockSpec((1, H, T), gath_idx3),
            pl.BlockSpec((1, H, T), gath_idx3),
        ],
        out_specs=[
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, T, Dh), out_idx),
            pl.BlockSpec((1, H, T, Dh), out_idx),
            pl.BlockSpec((1, H, T), out_idx3),
            pl.BlockSpec((1, H, T), out_idx3),
        ],
    )
    kv_bytes = B * H * T * Dh
    return pl.pallas_call(
        functools.partial(_kernel, dh=Dh),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, Dh), jnp.int8),
            jax.ShapeDtypeStruct((B, H, T, Dh), jnp.int8),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ],
        # accurate costs let XLA's scheduler overlap the next layer's weight
        # streaming with this kernel instead of treating it as opaque
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * Dh,
            bytes_accessed=4 * kv_bytes + 4 * B * H * T * 8,
            transcendentals=B * H * T,
        ),
        interpret=interpret,
    )(step_arr, src, q, k_t, v_t, k_cache, v_cache, k_scale, v_scale)


# ---------------------------------------------------------------------------
# Packed-int4 KV variant: halves the per-step KV HBM traffic vs int8
# ---------------------------------------------------------------------------
#
# Caches are (B, H, T, Dh/2) int8 with two int4 values per byte in SPLIT-HALF
# order (ops/attention.py quantize_kv_rows_int4): byte j = value j (low
# nibble) | value j+Dh/2 (high nibble). The attention contraction splits into
# a low-half and a high-half dot, so no nibble interleave ever materializes;
# the value contraction emits the two output halves directly.


def _reference_int4(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale, step,
                    src):
    """Pure-JAX reference (and CPU fallback) for the packed-int4 kernel."""
    from seamless_communication_tpu.ops.attention import (
        quantize_kv_rows_int4, unpack_int4,
    )

    dtype = q.dtype
    B, H, T, _ = k_cache.shape
    dh = q.shape[-1]
    k_cache, v_cache = k_cache[src], v_cache[src]
    k_scale, v_scale = k_scale[src], v_scale[src]

    k_lo, k_hi = unpack_int4(k_cache)
    q_lo, q_hi = q[..., :dh // 2], q[..., dh // 2:]
    logits = (jnp.einsum("bhd,bhtd->bht", q_lo, k_lo.astype(dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhd,bhtd->bht", q_hi, k_hi.astype(dtype),
                           preferred_element_type=jnp.float32))
    logits = logits * k_scale / math.sqrt(dh)
    lcur = jnp.einsum("bhd,bhd->bh", q, k_t,
                      preferred_element_type=jnp.float32) / math.sqrt(dh)
    t = jnp.arange(T)[None, None, :]
    valid = t < step
    logits = jnp.where(valid, logits, NEG)
    m = jnp.maximum(jnp.max(logits, axis=-1), lcur)
    p = jnp.where(valid, jnp.exp(logits - m[..., None]), 0.0)
    pc = jnp.exp(lcur - m)
    den = jnp.sum(p, axis=-1) + pc
    v_lo, v_hi = unpack_int4(v_cache)
    pv = (p * v_scale).astype(dtype)
    out = jnp.concatenate(
        [jnp.einsum("bht,bhtd->bhd", pv, v_lo.astype(dtype),
                    preferred_element_type=jnp.float32),
         jnp.einsum("bht,bhtd->bhd", pv, v_hi.astype(dtype),
                    preferred_element_type=jnp.float32)], axis=-1)
    out = (out + pc[..., None] * v_t.astype(jnp.float32)) / den[..., None]

    kq, ks = quantize_kv_rows_int4(k_t)
    vq, vs = quantize_kv_rows_int4(v_t)
    is_cur = t == step
    new_k = jnp.where(is_cur[..., None], kq[:, :, None, :], k_cache)
    new_v = jnp.where(is_cur[..., None], vq[:, :, None, :], v_cache)
    new_ks = jnp.where(is_cur, ks[:, :, None], k_scale)
    new_vs = jnp.where(is_cur, vs[:, :, None], v_scale)
    return out.astype(dtype), new_k, new_v, new_ks, new_vs


def _kernel_int4(step_ref, src_ref, q_ref, kt_ref, vt_ref, kc_ref, vc_ref,
                 ks_ref, vs_ref, out_ref, nkc_ref, nvc_ref, nks_ref, nvs_ref,
                 *, dh: int):
    """Packed-int4 variant of ``_kernel``: the gathered block is Dh/2 int8
    bytes; nibbles sign-extend through int32 shifts (Mosaic has no 8-bit
    shifts), the dots split into low/high halves."""
    step = step_ref[0]
    q = q_ref[0]                       # (H, Dh) model dtype
    dtype = q.dtype
    kc = kc_ref[0]                     # (H, T, Dh/2) int8 packed
    vc = vc_ref[0]
    ks = ks_ref[0]                     # (H, T) f32
    vs = vs_ref[0]
    H, T, _ = kc.shape
    dh2 = dh // 2

    # current-row int4 quantization (quantize_kv_rows_int4 semantics)
    ktf = kt_ref[0].astype(jnp.float32)
    vtf = vt_ref[0].astype(jnp.float32)
    sk = jnp.maximum(jnp.max(jnp.abs(ktf), axis=-1) / 7.0, 1e-8)     # (H,)
    sv = jnp.maximum(jnp.max(jnp.abs(vtf), axis=-1) / 7.0, 1e-8)
    k4 = jnp.clip(jnp.round(ktf / sk[:, None]), -7, 7).astype(jnp.int32)
    v4 = jnp.clip(jnp.round(vtf / sv[:, None]), -7, 7).astype(jnp.int32)
    # split-half pack in int32 (cast to int8 at the store)
    k4p = (k4[:, :dh2] & 0xF) | (k4[:, dh2:] << 4)                    # (H,Dh/2)
    v4p = (v4[:, :dh2] & 0xF) | (v4[:, dh2:] << 4)

    # nibble sign-extension staged through int32 (8-bit shifts unsupported)
    kc32 = kc.astype(jnp.int32)
    vc32 = vc.astype(jnp.int32)
    k_lo = ((kc32 << 28) >> 28).astype(dtype)                         # (H,T,Dh/2)
    k_hi = ((kc32 << 24) >> 28).astype(dtype)
    v_lo = ((vc32 << 28) >> 28).astype(dtype)
    v_hi = ((vc32 << 24) >> 28).astype(dtype)

    q_lo, q_hi = q[:, :dh2], q[:, dh2:]
    logits = jnp.concatenate([
        jax.lax.dot_general(q_lo[h:h + 1], k_lo[h],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(q_hi[h:h + 1], k_hi[h],
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                                   # (H, T)
    logits = logits * ks / math.sqrt(dh)
    lcur = jnp.sum(q.astype(jnp.float32) * ktf, axis=-1) / math.sqrt(dh)

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (H, T), 1)
    valid = t_iota < step
    logits = jnp.where(valid, logits, NEG)
    m = jnp.maximum(jnp.max(logits, axis=-1), lcur)                   # (H,)
    p = jnp.where(valid, jnp.exp(logits - m[:, None]), 0.0)
    pc = jnp.exp(lcur - m)
    den = jnp.sum(p, axis=-1) + pc

    p2 = (p * vs).astype(dtype)
    out_lo = jnp.concatenate([
        jax.lax.dot_general(p2[h:h + 1], v_lo[h],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)                                   # (H,Dh/2)
    out_hi = jnp.concatenate([
        jax.lax.dot_general(p2[h:h + 1], v_hi[h],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for h in range(H)], axis=0)
    out = jnp.concatenate([out_lo, out_hi], axis=-1)                  # (H, Dh)
    out = (out + pc[:, None] * vtf) / den[:, None]
    out_ref[0] = out.astype(dtype)

    # one-pass write-back (f32-staged select, as in _kernel)
    is_cur = t_iota == step
    is_cur3 = jax.lax.broadcasted_iota(jnp.int32, kc.shape, 1) == step
    nkc_ref[0] = jnp.where(is_cur3, k4p.astype(jnp.float32)[:, None, :],
                           kc.astype(jnp.float32)).astype(jnp.int8)
    nvc_ref[0] = jnp.where(is_cur3, v4p.astype(jnp.float32)[:, None, :],
                           vc.astype(jnp.float32)).astype(jnp.int8)
    nks_ref[0] = jnp.where(is_cur, sk[:, None], ks)
    nvs_ref[0] = jnp.where(is_cur, sv[:, None], vs)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_call_int4(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                      step_arr, src, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, Dh2 = k_cache.shape
    Dh = q.shape[-1]

    def vec_idx(b, step_r, src_r):
        return (b, 0, 0)

    def gath_idx(b, step_r, src_r):
        return (src_r[b], 0, 0, 0)

    def gath_idx3(b, step_r, src_r):
        return (src_r[b], 0, 0)

    def out_idx(b, step_r, src_r):
        return (b, 0, 0, 0)

    def out_idx3(b, step_r, src_r):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, T, Dh2), gath_idx),
            pl.BlockSpec((1, H, T, Dh2), gath_idx),
            pl.BlockSpec((1, H, T), gath_idx3),
            pl.BlockSpec((1, H, T), gath_idx3),
        ],
        out_specs=[
            pl.BlockSpec((1, H, Dh), vec_idx),
            pl.BlockSpec((1, H, T, Dh2), out_idx),
            pl.BlockSpec((1, H, T, Dh2), out_idx),
            pl.BlockSpec((1, H, T), out_idx3),
            pl.BlockSpec((1, H, T), out_idx3),
        ],
    )
    kv_bytes = B * H * T * Dh2
    return pl.pallas_call(
        functools.partial(_kernel_int4, dh=Dh),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, Dh2), jnp.int8),
            jax.ShapeDtypeStruct((B, H, T, Dh2), jnp.int8),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
            jax.ShapeDtypeStruct((B, H, T), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * Dh,
            bytes_accessed=4 * kv_bytes + 4 * B * H * T * 8,
            transcendentals=B * H * T,
        ),
        interpret=interpret,
    )(step_arr, src, q, k_t, v_t, k_cache, v_cache, k_scale, v_scale)


def fused_decode_self_attention_int4(q, k_t, v_t, k_cache, v_cache,
                                     k_scale, v_scale, step, src, *,
                                     use_pallas: bool | None = None,
                                     interpret: bool = False):
    """Packed-int4-KV fused gather+insert+attend decode step: same contract
    as :func:`fused_decode_self_attention_int8` with (B,H,T,Dh/2) packed
    caches — half the KV HBM traffic per step."""
    import os

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("SEAMLESS_PALLAS_DECODE") != "0")
    if use_pallas:
        B, H, T, Dh2 = k_cache.shape
        # int8 packed in+out blocks + f32 select staging + nibble-unpack
        # staging (4 half-width dtype planes) + f32 scales
        block_bytes = H * T * Dh2 * (2 + 2 + 8 + 8) + 4 * H * T * 4
        if 2 * block_bytes > 12 * 1024 * 1024:
            use_pallas = False
    if not use_pallas:
        return _reference_int4(q, k_t, v_t, k_cache, v_cache, k_scale,
                               v_scale, step, src)
    step_arr = jnp.reshape(jnp.asarray(step, jnp.int32), (1,))
    return _pallas_call_int4(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                             step_arr, jnp.asarray(src, jnp.int32),
                             interpret=interpret)


# ---------------------------------------------------------------------------
# Lazy-reorder (row-origin indexed) decode attention
# ---------------------------------------------------------------------------
#
# Physically permuting the KV cache every beam step costs a full cache pass in
# the kernel PLUS an XLA copy back into the while-loop carry (pallas outputs
# cannot alias their inputs across a beam gather). The indexed variant never
# moves the cache: a tiny (B, T) ``row_src`` table records, for each logical
# beam b and position t, WHICH physical slot wrote that row. Attention reads
# through the table; the only cache write per step is the new (B, H, 1, Dh)
# row at each beam's own slot (a cheap XLA dynamic-update-slice outside the
# kernel). Per layer per step this replaces ~10.8 MB of HBM traffic
# (gather-read + permuted-write + carry-copy) with one 3.4 MB read.


def _indexed_reference(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                       row_src, step):
    """Pure-JAX reference (and CPU fallback): gather rows through ``row_src``
    then the exact math of ``_reference``. Returns only the attention output;
    the caller writes the new row. Shapes as ``_reference`` plus
    row_src (B, T) int32."""
    dtype = q.dtype
    B, H, T, Dh = k_cache.shape
    idx = row_src[:, None, :, None]                       # (B,1,T,1)
    kc = jnp.take_along_axis(k_cache, idx, axis=0)
    vc = jnp.take_along_axis(v_cache, idx, axis=0)
    ks = jnp.take_along_axis(k_scale, row_src[:, None, :], axis=0)
    vs = jnp.take_along_axis(v_scale, row_src[:, None, :], axis=0)

    logits = jnp.einsum("bhd,bhtd->bht", q, kc.astype(dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * ks / math.sqrt(Dh)
    lcur = jnp.einsum("bhd,bhd->bh", q, k_t,
                      preferred_element_type=jnp.float32) / math.sqrt(Dh)
    t = jnp.arange(T)[None, None, :]
    valid = t < step
    logits = jnp.where(valid, logits, NEG)
    m = jnp.maximum(jnp.max(logits, axis=-1), lcur)
    p = jnp.where(valid, jnp.exp(logits - m[..., None]), 0.0)
    pc = jnp.exp(lcur - m)
    den = jnp.sum(p, axis=-1) + pc
    out = jnp.einsum("bht,bhtd->bhd", (p * vs).astype(dtype),
                     vc.astype(dtype), preferred_element_type=jnp.float32)
    out = (out + pc[..., None] * v_t.astype(jnp.float32)) / den[..., None]
    return out.astype(dtype)


def _indexed_onehot(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                    row_src, step):
    """Vectorized lazy-reorder decode attention: the per-(beam, position)
    row-origin gather is folded into plain MXU einsums against a one-hot of
    ``row_src`` — no Pallas, no take_along_axis over the cache, no permuted
    write-back.

    Every logical beam attends against EVERY physical slot
    (``bhd,shtd->bsht``), then the (B, B, T) one-hot selects the origin row's
    logit per position; the value contraction folds the same one-hot into the
    probabilities (``bsht,shtd->bhd``). The caches are read exactly ONCE and
    never written; the extra B× MXU flops are free — the decode step is
    HBM-bound (docs/performance.md). Logits are bit-identical to
    ``_indexed_reference`` (the select adds exact zeros); the value
    contraction reassociates the same products, so outputs match to f32
    rounding. Memory for the (B,B,H,T) logit intermediate caps the useful B
    (the wrapper falls back to the gather formulation for large B·T)."""
    dtype = q.dtype
    B, H, T, Dh = k_cache.shape
    # per-row scale selects are tiny (B,H,T) — gather directly
    ks = jnp.take_along_axis(k_scale, row_src[:, None, :], axis=0)
    vs = jnp.take_along_axis(v_scale, row_src[:, None, :], axis=0)
    # w[b, s, t] = 1 iff logical beam b's row t lives in physical slot s
    w = (row_src[:, None, :]
         == jnp.arange(B, dtype=row_src.dtype)[None, :, None])

    lall = jnp.einsum("bhd,shtd->bsht", q, k_cache.astype(dtype),
                      preferred_element_type=jnp.float32)
    logits = jnp.sum(lall * w[:, :, None, :], axis=1)          # (B, H, T)
    logits = logits * ks / math.sqrt(Dh)
    lcur = jnp.einsum("bhd,bhd->bh", q, k_t,
                      preferred_element_type=jnp.float32) / math.sqrt(Dh)
    t = jnp.arange(T)[None, None, :]
    valid = t < step
    logits = jnp.where(valid, logits, NEG)
    m = jnp.maximum(jnp.max(logits, axis=-1), lcur)
    p = jnp.where(valid, jnp.exp(logits - m[..., None]), 0.0)
    pc = jnp.exp(lcur - m)
    den = jnp.sum(p, axis=-1) + pc

    pw = (p * vs)[:, None, :, :] * w[:, :, None, :]            # (B, S, H, T)
    out = jnp.einsum("bsht,shtd->bhd", pw.astype(dtype), v_cache.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = (out + pc[..., None] * v_t.astype(jnp.float32)) / den[..., None]
    return out.astype(dtype)


def _indexed_kernel(step_ref, q_ref, kt_ref, vt_ref, kc_ref, vc_ref,
                    ks_ref, vs_ref, rs_ref, out_ref, *, dh: int):
    """Single-program kernel: all beams' caches resident in VMEM once.

    Per logical beam b: per-head logits against EVERY physical slot in one
    widened dot (q_h (1,Dh) x K_h (B*T, Dh)^C -> (1, B*T)), then the row-origin
    select runs on the SMALL (T,) logit vectors rather than the (H,T,Dh)
    cache; the value contraction reuses the same trick with a (B*T,)
    select-masked probability vector. No full-cache gather, select, or write
    ever materializes."""
    step = step_ref[0]
    B, H, T, _ = kc_ref.shape
    dtype = q_ref.dtype
    inv_sqrt = 1.0 / math.sqrt(dh)

    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)    # (1, T)
    valid = t_iota < step

    for b in range(B):
        rs = rs_ref[b][None, :]                                 # (1, T) int32
        outs = []
        for h in range(H):
            qh = q_ref[b, h][None, :]                           # (1, Dh)
            # logits vs every physical slot: (1, B*T)
            lall = [
                jax.lax.dot_general(qh, kc_ref[s, h][...].astype(dtype),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                for s in range(B)]                              # B x (1, T)
            # select this beam's origin rows + apply per-row K scales
            lsel = jnp.zeros((1, T), jnp.float32)
            for s in range(B):
                contrib = lall[s] * ks_ref[s, h][None, :]
                lsel = lsel + jnp.where(rs == s, contrib, 0.0)
            lsel = lsel * inv_sqrt
            lcur = jnp.sum(q_ref[b, h].astype(jnp.float32)
                           * kt_ref[b, h].astype(jnp.float32)) * inv_sqrt
            lsel = jnp.where(valid, lsel, NEG)
            m = jnp.maximum(jnp.max(lsel), lcur)
            p = jnp.where(valid, jnp.exp(lsel - m), 0.0)        # (1, T)
            pc = jnp.exp(lcur - m)
            den = jnp.sum(p) + pc
            # value contraction: per-slot masked probabilities x slot values
            acc = jnp.zeros((1, dh), jnp.float32)
            for s in range(B):
                ps = jnp.where(rs == s, p * vs_ref[s, h][None, :], 0.0)
                acc = acc + jax.lax.dot_general(
                    ps.astype(dtype), vc_ref[s, h][...].astype(dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o = (acc + pc * vt_ref[b, h].astype(jnp.float32)[None, :]) / den
            outs.append(o)
        out_ref[b] = jnp.concatenate(outs, axis=0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _indexed_pallas_call(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                         row_src, step_arr, *, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, Dh = k_cache.shape
    kv_bytes = 2 * B * H * T * Dh + 2 * B * H * T * 4
    return pl.pallas_call(
        functools.partial(_indexed_kernel, dh=Dh),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(x.shape,
                                   (lambda nd: lambda i, s: (0,) * nd)(x.ndim))
                      for x in (q, k_t, v_t, k_cache, v_cache,
                                k_scale, v_scale, row_src)],
            out_specs=[pl.BlockSpec((B, H, Dh), lambda i, s: (0, 0, 0))],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, Dh), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * B * B * H * T * Dh,
            bytes_accessed=kv_bytes,
            transcendentals=B * H * T,
        ),
        interpret=interpret,
    )(step_arr, q, k_t, v_t, k_cache, v_cache, k_scale, v_scale, row_src)[0]


def onehot_fits(B: int, H: int, T: int) -> bool:
    """Whether the one-hot lazy formulation's (B,B,H,T) f32 logit intermediate
    is small enough to prefer over the gather paths. Shared by the dispatch
    below and decoder_cache_init's row_src-materialization default so the two
    policies cannot diverge."""
    return B * B * H * T * 4 <= 64 * 1024 * 1024


def indexed_decode_self_attention_int8(q, k_t, v_t, k_cache, v_cache,
                                       k_scale, v_scale, row_src, step, *,
                                       use_pallas: bool | None = None,
                                       interpret: bool = False):
    """Row-origin-indexed decode attention (int8 KV, lazy beam reorder).

    q/k_t/v_t: (B,H,Dh) current-token tensors; caches (B,H,T,Dh) int8 with
    (B,H,T) f32 scales, NEVER physically permuted; ``row_src`` (B,T) int32
    maps (logical beam, position) -> physical slot. Returns out (B,H,Dh);
    the caller quantizes and writes the new row at [b, :, step] and updates
    ``row_src`` (see transformer_decoder_step).

    Formulation is selected by SEAMLESS_LAZY_KERNEL: "onehot" (default —
    vectorized one-hot einsums, pure XLA, see ``_indexed_onehot``), "pallas"
    (the single-program kernel; measured slower, kept for reference), or
    "gather" (``_indexed_reference``). Large B·(B,H,T) intermediates fall
    back from onehot to gather.
    """
    import os

    kind = os.environ.get("SEAMLESS_LAZY_KERNEL", "onehot")
    if use_pallas is not None:
        # explicit request (tests): honor it
        kind = "pallas" if use_pallas else "gather"
    if kind == "onehot":
        B, H, T, _ = k_cache.shape
        if onehot_fits(B, H, T):
            return _indexed_onehot(q, k_t, v_t, k_cache, v_cache,
                                   k_scale, v_scale, row_src, step)
        kind = "gather"

    if use_pallas is None:
        use_pallas = (kind == "pallas"
                      and jax.default_backend() == "tpu"
                      and os.environ.get("SEAMLESS_PALLAS_DECODE") != "0")
    if use_pallas:
        B, H, T, Dh = k_cache.shape
        resident = 2 * B * H * T * (Dh + 4) + 8 * B * T
        if resident > 10 * 1024 * 1024:
            use_pallas = False
    if not use_pallas:
        return _indexed_reference(q, k_t, v_t, k_cache, v_cache,
                                  k_scale, v_scale, row_src, step)
    step_arr = jnp.reshape(jnp.asarray(step, jnp.int32), (1,))
    return _indexed_pallas_call(q, k_t, v_t, k_cache, v_cache,
                                k_scale, v_scale,
                                jnp.asarray(row_src, jnp.int32), step_arr,
                                interpret=interpret)


def fused_decode_self_attention_int8(q, k_t, v_t, k_cache, v_cache,
                                     k_scale, v_scale, step, src, *,
                                     use_pallas: bool | None = None,
                                     interpret: bool = False):
    """Fused gather+insert+attend decode step (int8 KV).

    q/k_t/v_t: (B,H,Dh) projected current-token tensors; caches (B,H,T,Dh)
    int8 with (B,H,T) f32 row scales; ``src`` (B,) beam-origin permutation
    applied to the caches; ``step`` current position. Returns
    (out (B,H,Dh), new_k, new_v, new_k_scale, new_v_scale).

    ``use_pallas=None`` auto-selects: the kernel on TPU, the identical-math
    pure-JAX composition elsewhere (or with SEAMLESS_PALLAS_DECODE=0).
    """
    import os

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("SEAMLESS_PALLAS_DECODE") != "0")
    if use_pallas:
        # per-program VMEM: in+out int8 KV blocks, their f32 select staging,
        # and f32 scales, double-buffered by the pipeline; stay well under
        # the ~16 MB budget (v2-large T=262 uses ~6 MB; T>=512 falls back)
        B, H, T, Dh = k_cache.shape
        block_bytes = H * T * Dh * (2 + 2 + 8) + 4 * H * T * 4
        if 2 * block_bytes > 12 * 1024 * 1024:
            use_pallas = False
    if not use_pallas:
        return _reference(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                          step, src)
    step_arr = jnp.reshape(jnp.asarray(step, jnp.int32), (1,))
    return _pallas_call(q, k_t, v_t, k_cache, v_cache, k_scale, v_scale,
                        step_arr, jnp.asarray(src, jnp.int32),
                        interpret=interpret)
