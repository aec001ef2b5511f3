"""Multi-head attention ops: vanilla SDPA, Shaw clipped relative-position attention
(SeamlessM4T v2 speech encoder), and Transformer-XL u/v-bias relative attention
(v1 w2v-BERT speech encoder), plus a KV-cached single-step decode path.

Reference semantics: ``ggml/examples/unity/fairseq2.cpp:399-604`` (MultiheadAttention),
``:605-697`` (RelativePositionMHA). Conventions follow the HF checkpoint-validated
implementations (transformers seamless_m4t / seamless_m4t_v2).

All logit math is fp32; inputs/outputs keep the activation dtype (bf16 on TPU).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import linear, linear_init


# ---------------------------------------------------------------------------
# Parameter init
# ---------------------------------------------------------------------------

def mha_init(key: jax.Array, dim: int, num_heads: int, *, kv_dim: Optional[int] = None,
             bias: bool = True, dtype=jnp.float32) -> dict:
    kv_dim = kv_dim or dim
    ks = jax.random.split(key, 4)
    return {
        "q_proj": linear_init(ks[0], dim, dim, bias=bias, dtype=dtype),
        "k_proj": linear_init(ks[1], kv_dim, dim, bias=bias, dtype=dtype),
        "v_proj": linear_init(ks[2], kv_dim, dim, bias=bias, dtype=dtype),
        "output_proj": linear_init(ks[3], dim, dim, bias=bias, dtype=dtype),
    }


def _split_heads(x: jax.Array, num_heads: int) -> jax.Array:
    """(B, T, D) -> (B, H, T, Dh)"""
    B, T, D = x.shape
    return x.reshape(B, T, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, Dh) -> (B, T, D)"""
    B, H, T, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, T, H * Dh)


def _sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
          bias: Optional[jax.Array], *, extra_logits: Optional[jax.Array] = None,
          scale: Optional[float] = None) -> jax.Array:
    """Core scaled-dot-product attention on (B, H, T, Dh) tensors; fp32 softmax.

    On TPU, full-sequence calls route through the Pallas flash kernel
    (ops/fused_attention.py) — no HBM logits/probs materialization; the XLA
    composition below is the CPU/test/fallback path."""
    dh = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(dh)
    from seamless_communication_tpu.ops.fused_attention import try_flash
    fused = try_flash(q, k, v, bias, extra_logits, scale)
    if fused is not None:
        return fused
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if extra_logits is not None:
        logits = logits + extra_logits
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


# ---------------------------------------------------------------------------
# Standard MHA (self / cross)
# ---------------------------------------------------------------------------

def multi_head_attention(params: dict, q_in: jax.Array, kv_in: jax.Array,
                         num_heads: int, *, bias: Optional[jax.Array] = None) -> jax.Array:
    """Full-sequence MHA. ``bias`` is an additive fp32 logit mask broadcastable to
    (B, H, Tq, Tk)."""
    q = _split_heads(linear(params["q_proj"], q_in), num_heads)
    k = _split_heads(linear(params["k_proj"], kv_in), num_heads)
    v = _split_heads(linear(params["v_proj"], kv_in), num_heads)
    out = _sdpa(q, k, v, bias)
    return linear(params["output_proj"], _merge_heads(out))


# ---------------------------------------------------------------------------
# KV cache (preallocated, static shape) — replaces fairseq2 IncrementalStateBag
# (reference fairseq2.cpp:57-206).
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    k: jax.Array  # (B, H, T_max, Dh)
    v: jax.Array  # (B, H, T_max, Dh)


def kv_cache_init(batch: int, num_heads: int, max_len: int, head_dim: int,
                  dtype=jnp.bfloat16) -> KVCache:
    shape = (batch, num_heads, max_len, head_dim)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def self_attention_step(params: dict, x_t: jax.Array, cache: KVCache, step: jax.Array,
                        num_heads: int) -> tuple[jax.Array, KVCache]:
    """One decode step of causal self-attention.

    ``x_t``: (B, 1, D) current-token activations; ``step``: scalar int32 index of the
    current position. Appends K/V at ``step`` and attends over positions <= step.
    """
    B = x_t.shape[0]
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)       # (B,H,1,Dh)
    k_t = _split_heads(linear(params["k_proj"], x_t), num_heads)
    v_t = _split_heads(linear(params["v_proj"], x_t), num_heads)
    k = jax.lax.dynamic_update_slice(cache.k, k_t.astype(cache.k.dtype), (0, 0, step, 0))
    v = jax.lax.dynamic_update_slice(cache.v, v_t.astype(cache.v.dtype), (0, 0, step, 0))
    t_max = k.shape[2]
    valid = jnp.arange(t_max)[None, None, None, :] <= step
    bias = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    out = _sdpa(q, k.astype(x_t.dtype), v.astype(x_t.dtype), bias)
    return linear(params["output_proj"], _merge_heads(out)), KVCache(k, v)


class Int8KVCache(NamedTuple):
    """int8 row-quantized KV cache: halves decode HBM traffic vs bf16 (the KV
    read is a significant share of per-step bandwidth at production dims).
    Scales are per (batch, head, position) absmax/127."""
    k: jax.Array        # (B, H, T_max, Dh) int8
    v: jax.Array        # (B, H, T_max, Dh) int8
    k_scale: jax.Array  # (B, H, T_max) fp32
    v_scale: jax.Array  # (B, H, T_max) fp32


def quantize_kv_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., Dh) -> int8 rows + per-row fp32 scales."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def int8_kv_cache_init(batch: int, num_heads: int, max_len: int, head_dim: int
                       ) -> Int8KVCache:
    shape = (batch, num_heads, max_len, head_dim)
    return Int8KVCache(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape[:3], jnp.float32),
                       jnp.zeros(shape[:3], jnp.float32))


def self_attention_step_int8(params: dict, x_t: jax.Array, cache: Int8KVCache,
                             step: jax.Array, num_heads: int
                             ) -> tuple[jax.Array, Int8KVCache]:
    """One causal decode step over an int8 KV cache. The k-row scales fold into
    the attention logits and the v-row scales into the probabilities, so the
    matmuls consume the int8 tables directly (XLA fuses the int8->bf16 convert
    into the dot; HBM reads stay 1 byte/elem)."""
    B = x_t.shape[0]
    dtype = x_t.dtype
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)       # (B,H,1,Dh)
    k_t = _split_heads(linear(params["k_proj"], x_t), num_heads)
    v_t = _split_heads(linear(params["v_proj"], x_t), num_heads)
    kq, ks = quantize_kv_rows(k_t)
    vq, vs = quantize_kv_rows(v_t)
    k = jax.lax.dynamic_update_slice(cache.k, kq, (0, 0, step, 0))
    v = jax.lax.dynamic_update_slice(cache.v, vq, (0, 0, step, 0))
    k_scale = jax.lax.dynamic_update_slice(cache.k_scale, ks, (0, 0, step))
    v_scale = jax.lax.dynamic_update_slice(cache.v_scale, vs, (0, 0, step))
    t_max = k.shape[2]
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k.astype(dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * k_scale[:, :, None, :] / math.sqrt(dh)
    valid = jnp.arange(t_max)[None, None, None, :] <= step
    logits = jnp.where(valid, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd",
                     (probs * v_scale[:, :, None, :]).astype(dtype),
                     v.astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    y = linear(params["output_proj"], _merge_heads(out))
    return y, Int8KVCache(k, v, k_scale, v_scale)


def self_attention_step_nocache(params: dict, x_t: jax.Array, k_cache: jax.Array,
                                v_cache: jax.Array, step: jax.Array,
                                num_heads: int):
    """Causal decode attention that does NOT write the KV cache: reads history
    from ``k_cache``/``v_cache`` (positions < step) and handles the current
    token's K/V exactly, returning them for the caller to store with ONE
    dynamic-update-slice on the full stacked cache.

    Threading the full per-layer cache through ``lax.scan`` outputs copies the
    whole cache every step (measured ~2.3 ms/step on the v5e S2ST bench, the
    single largest decode cost); this variant's scan outputs are (B,H,1,Dh).
    Returns (y, k_t, v_t)."""
    dtype = x_t.dtype
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)       # (B,H,1,Dh)
    k_t = _split_heads(linear(params["k_proj"], x_t), num_heads)
    v_t = _split_heads(linear(params["v_proj"], x_t), num_heads)
    dh = q.shape[-1]
    t_max = k_cache.shape[2]

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache.astype(dtype),
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
    logit_cur = jnp.einsum("bhqd,bhqd->bhq", q, k_t,
                           preferred_element_type=jnp.float32) / math.sqrt(dh)
    valid = jnp.arange(t_max)[None, None, None, :] < step
    is_cur = jnp.arange(t_max)[None, None, None, :] == step
    logits = jnp.where(valid, logits,
                       jnp.where(is_cur, logit_cur[..., None], -1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    p_hist = jnp.where(is_cur, 0.0, probs)
    p_cur = jnp.sum(jnp.where(is_cur, probs, 0.0), axis=-1)          # (B,H,1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p_hist.astype(dtype),
                     v_cache.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = (out + p_cur[..., None] * v_t.astype(jnp.float32)).astype(dtype)
    y = linear(params["output_proj"], _merge_heads(out))
    return y, k_t, v_t


def self_attention_step_nocache_int8(params: dict, x_t: jax.Array,
                                     k_cache: jax.Array, v_cache: jax.Array,
                                     k_scale: jax.Array, v_scale: jax.Array,
                                     step: jax.Array, num_heads: int):
    """int8-KV variant of :func:`self_attention_step_nocache`. Returns
    (y, kq, ks, vq, vs) — the caller stores the quantized current row."""
    dtype = x_t.dtype
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)       # (B,H,1,Dh)
    k_t = _split_heads(linear(params["k_proj"], x_t), num_heads)
    v_t = _split_heads(linear(params["v_proj"], x_t), num_heads)
    kq, ks = quantize_kv_rows(k_t)
    vq, vs = quantize_kv_rows(v_t)
    dh = q.shape[-1]
    t_max = k_cache.shape[2]

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache.astype(dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * k_scale[:, :, None, :] / math.sqrt(dh)
    logit_cur = jnp.einsum("bhqd,bhqd->bhq", q, k_t,
                           preferred_element_type=jnp.float32) / math.sqrt(dh)
    valid = jnp.arange(t_max)[None, None, None, :] < step
    is_cur = jnp.arange(t_max)[None, None, None, :] == step
    logits = jnp.where(valid, logits,
                       jnp.where(is_cur, logit_cur[..., None], -1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    p_hist = jnp.where(is_cur, 0.0, probs)
    p_cur = jnp.sum(jnp.where(is_cur, probs, 0.0), axis=-1)          # (B,H,1)
    out = jnp.einsum("bhqk,bhkd->bhqd",
                     (p_hist * v_scale[:, :, None, :]).astype(dtype),
                     v_cache.astype(dtype),
                     preferred_element_type=jnp.float32)
    out = (out + p_cur[..., None] * v_t.astype(jnp.float32)).astype(dtype)
    y = linear(params["output_proj"], _merge_heads(out))
    return y, kq, ks, vq, vs


def quantize_kv_rows_int4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(..., Dh) -> PACKED int4 rows (..., Dh/2) int8 + per-row fp32 scales.

    Split-half packing: byte j holds value j in its low nibble and value
    j + Dh/2 in its high nibble, so consumers never interleave — the dot
    contraction just splits into a low-half and a high-half dot
    (ops/kernels/decode_attention.py int4 kernel). Quantization is symmetric
    absmax/7 per (batch, head, position) row."""
    xf = x.astype(jnp.float32)
    dh = xf.shape[-1]
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / 7.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s[..., None]), -7, 7).astype(jnp.int8)
    lo, hi = q[..., :dh // 2], q[..., dh // 2:]
    return (lo & jnp.int8(0x0F)) | (hi << 4), s


def unpack_int4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Packed (..., Dh/2) int8 -> (lo, hi) int8 halves (split-half order:
    full row = concat([lo, hi], axis=-1))."""
    lo = (packed << 4) >> 4            # arithmetic shifts sign-extend int4
    hi = packed >> 4
    return lo, hi


def self_attention_step_nocache_int4(params: dict, x_t: jax.Array,
                                     k_cache: jax.Array, v_cache: jax.Array,
                                     k_scale: jax.Array, v_scale: jax.Array,
                                     step: jax.Array, num_heads: int):
    """Packed-int4-KV variant of :func:`self_attention_step_nocache_int8`:
    caches are (B, H, T, Dh/2) int8 split-half packed nibbles. The contraction
    splits into low/high-half dots so the (B,H,T,Dh) dequantized cache never
    materializes in HBM. Returns (y, kq4, ks, vq4, vs)."""
    dtype = x_t.dtype
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)       # (B,H,1,Dh)
    k_t = _split_heads(linear(params["k_proj"], x_t), num_heads)
    v_t = _split_heads(linear(params["v_proj"], x_t), num_heads)
    kq, ks = quantize_kv_rows_int4(k_t)
    vq, vs = quantize_kv_rows_int4(v_t)
    dh = q.shape[-1]
    t_max = k_cache.shape[2]

    k_lo, k_hi = unpack_int4(k_cache)
    q_lo, q_hi = q[..., :dh // 2], q[..., dh // 2:]
    logits = (jnp.einsum("bhqd,bhkd->bhqk", q_lo, k_lo.astype(dtype),
                         preferred_element_type=jnp.float32)
              + jnp.einsum("bhqd,bhkd->bhqk", q_hi, k_hi.astype(dtype),
                           preferred_element_type=jnp.float32))
    logits = logits * k_scale[:, :, None, :] / math.sqrt(dh)
    logit_cur = jnp.einsum("bhqd,bhqd->bhq", q, k_t,
                           preferred_element_type=jnp.float32) / math.sqrt(dh)
    valid = jnp.arange(t_max)[None, None, None, :] < step
    is_cur = jnp.arange(t_max)[None, None, None, :] == step
    logits = jnp.where(valid, logits,
                       jnp.where(is_cur, logit_cur[..., None], -1e9))
    probs = jax.nn.softmax(logits, axis=-1)
    p_hist = jnp.where(is_cur, 0.0, probs)
    p_cur = jnp.sum(jnp.where(is_cur, probs, 0.0), axis=-1)          # (B,H,1)
    v_lo, v_hi = unpack_int4(v_cache)
    pv = (p_hist * v_scale[:, :, None, :]).astype(dtype)
    out = jnp.concatenate(
        [jnp.einsum("bhqk,bhkd->bhqd", pv, v_lo.astype(dtype),
                    preferred_element_type=jnp.float32),
         jnp.einsum("bhqk,bhkd->bhqd", pv, v_hi.astype(dtype),
                    preferred_element_type=jnp.float32)], axis=-1)
    out = (out + p_cur[..., None] * v_t.astype(jnp.float32)).astype(dtype)
    y = linear(params["output_proj"], _merge_heads(out))
    return y, kq, ks, vq, vs


def cross_attention_precompute_int8(params: dict, enc_out: jax.Array,
                                    num_heads: int) -> Int8KVCache:
    kv = cross_attention_precompute(params, enc_out, num_heads)
    kq, ks = quantize_kv_rows(kv.k)
    vq, vs = quantize_kv_rows(kv.v)
    return Int8KVCache(kq, vq, ks, vs)


def cross_attention_step_int8(params: dict, x_t: jax.Array, enc_kv: Int8KVCache,
                              num_heads: int, *,
                              bias: Optional[jax.Array] = None) -> jax.Array:
    dtype = x_t.dtype
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, enc_kv.k.astype(dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * enc_kv.k_scale[:, :, None, :] / math.sqrt(dh)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd",
                     (probs * enc_kv.v_scale[:, :, None, :]).astype(dtype),
                     enc_kv.v.astype(dtype),
                     preferred_element_type=jnp.float32).astype(dtype)
    return linear(params["output_proj"], _merge_heads(out))


def cross_attention_precompute(params: dict, enc_out: jax.Array, num_heads: int) -> KVCache:
    """Project encoder output to K/V once; reused every decode step
    (fairseq2 static KV cache for encoder-decoder attention)."""
    k = _split_heads(linear(params["k_proj"], enc_out), num_heads)
    v = _split_heads(linear(params["v_proj"], enc_out), num_heads)
    return KVCache(k, v)


def cross_attention_step(params: dict, x_t: jax.Array, enc_kv: KVCache,
                         num_heads: int, *, bias: Optional[jax.Array] = None,
                         return_probs: bool = False):
    q = _split_heads(linear(params["q_proj"], x_t), num_heads)
    dh = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, enc_kv.k.astype(q.dtype),
                        preferred_element_type=jnp.float32) / math.sqrt(dh)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), enc_kv.v.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(x_t.dtype)
    y = linear(params["output_proj"], _merge_heads(out))
    if return_probs:
        return y, probs
    return y


# ---------------------------------------------------------------------------
# Shaw clipped relative-position self-attention (v2 conformer_shaw encoder)
# reference: models/conformer_shaw/builder.py:127-146 (max_left=64, max_right=8)
# ---------------------------------------------------------------------------

def shaw_attention_init(key: jax.Array, dim: int, num_heads: int, *, max_left: int,
                        max_right: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    params = mha_init(k1, dim, num_heads, dtype=dtype)
    head_dim = dim // num_heads
    num_pos = max_left + max_right + 1
    params["rel_k_embed"] = {
        "embedding": (jax.random.normal(k2, (num_pos, head_dim), jnp.float32)
                      * head_dim ** -0.5).astype(dtype)
    }
    return params


def shaw_self_attention(params: dict, x: jax.Array, num_heads: int, *,
                        max_left: int, max_right: int,
                        bias: Optional[jax.Array] = None) -> jax.Array:
    """logits[i,j] = (q_i·k_j + q_i·E[clip(j-i, -L, R) + L]) / sqrt(dh)."""
    q = _split_heads(linear(params["q_proj"], x), num_heads)
    k = _split_heads(linear(params["k_proj"], x), num_heads)
    v = _split_heads(linear(params["v_proj"], x), num_heads)
    T = x.shape[1]
    dh = q.shape[-1]
    rel = params["rel_k_embed"]["embedding"].astype(q.dtype)      # (P, Dh)
    # distances j - i clipped; select over the small P axis. A
    # take_along_axis here lowers to a T^2-row gather (measured ~100 ms per
    # layer-pass at (32,16,500,P) on v5e — it dominated the XL train step
    # before the same fix); the one-hot einsum is bit-exact (each output sums
    # exactly one nonzero f32 term) and runs on the MXU.
    dist = jnp.clip(jnp.arange(T)[None, :] - jnp.arange(T)[:, None], -max_left, max_right)
    idx = dist + max_left                                          # (T, T) in [0, P)
    rel_logits_full = jnp.einsum("bhqd,pd->bhqp", q, rel,
                                 preferred_element_type=jnp.float32)  # (B,H,T,P)
    P = rel.shape[0]
    onehot = (idx[:, :, None] == jnp.arange(P)[None, None, :]
              ).astype(jnp.float32)                                # (T, T, P)
    rel_logits = jnp.einsum("bhqp,qjp->bhqj", rel_logits_full, onehot,
                            preferred_element_type=jnp.float32)    # (B,H,T,T)
    out = _sdpa(q, k, v, bias, extra_logits=rel_logits / math.sqrt(dh))
    return linear(params["output_proj"], _merge_heads(out))


# ---------------------------------------------------------------------------
# Transformer-XL u/v-bias relative attention (v1 w2v-BERT conformer)
# reference: fairseq2.cpp:605-697; HF SeamlessM4TConformerSelfAttention.
# ---------------------------------------------------------------------------

def xl_rel_table(seq_len: int, dim: int, dtype=jnp.float32) -> jax.Array:
    """(2*seq_len - 1, dim) interleaved sin/cos encodings of signed distance; row m
    encodes d = (seq_len - 1) - m (positive = key left of query), matching HF
    SeamlessM4TConformerRelPositionalEmbedding."""
    half_ids = jnp.arange(0, dim, 2, dtype=jnp.float32)
    inv_freq = jnp.exp(half_ids * (-math.log(10000.0) / dim))
    d = jnp.arange(seq_len - 1, -seq_len, -1, dtype=jnp.float32)[:, None]
    ang = d * inv_freq[None, :]
    table = jnp.zeros((2 * seq_len - 1, dim), jnp.float32)
    table = table.at[:, 0::2].set(jnp.sin(ang))
    table = table.at[:, 1::2].set(jnp.cos(ang))
    return table.astype(dtype)


def xl_attention_init(key: jax.Array, dim: int, num_heads: int, *,
                      dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    params = mha_init(k1, dim, num_heads, dtype=dtype)
    head_dim = dim // num_heads
    params["r_proj"] = linear_init(k2, dim, dim, bias=False, dtype=dtype)
    params["u_bias"] = jnp.zeros((num_heads, head_dim), dtype)
    params["v_bias"] = jnp.zeros((num_heads, head_dim), dtype)
    return params


def _xl_rel_bias(qv: jax.Array, w_r: jax.Array) -> jax.Array:
    """Relative-position term bd[b,h,i,j] = (q+v)[b,h,i] · r(i-j)[h] without
    materializing the (B, H, T, 2T-1) tensor or any gather/skew.

    The naive route (einsum against the projected rel table, then the
    Transformer-XL skew) is gather/relayout-bound on TPU: the skew measured
    ~70 ms/layer-pass at (32,16,500,999) f32 — over half the train step.
    Because the rel table rows are interleaved sinusoids of the signed
    distance (``xl_rel_table``), the addition formula factorizes the bias
    into per-position terms:

        sin((i-j)w) = sin(iw)cos(jw) - cos(iw)sin(jw)
        cos((i-j)w) = cos(iw)cos(jw) + sin(iw)sin(jw)

    With z[b,h,i,:] = (q+v)[b,h,i] routed back through the r-projection
    (z_s/z_c = sin/cos input rows of W_r), the bias becomes two MXU matmuls
    against tiny (T, E/2) sinusoid tables:

        A = z_s*sin_i + z_c*cos_i ;  B = z_c*sin_i - z_s*cos_i
        bd = A @ cos_j^T + B @ sin_j^T

    Mathematically identical to the table+skew formulation (same f32
    accumulation tolerance as any matmul reassociation); ~5x fewer HBM
    bytes and no gathers.

    qv: (B, H, T, Dh) = q + v_bias. w_r: (E, D) r_proj weight, (in, out).
    Returns (B, H, T, T) f32.
    """
    Bq, H, T, dh = qv.shape
    E = w_r.shape[0]
    inv_freq = jnp.exp(jnp.arange(0, E, 2, dtype=jnp.float32)
                       * (-math.log(10000.0) / E))                  # (E/2,)
    ang = jnp.arange(T, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    sin_p, cos_p = jnp.sin(ang), jnp.cos(ang)                       # (T, E/2)
    # r(d)[h] = rel(d) @ W_r split to heads; rel even cols are sin, odd cos
    w_s = w_r[0::2].reshape(E // 2, H, dh)
    w_c = w_r[1::2].reshape(E // 2, H, dh)
    # z/a/b stay in the model dtype (bf16 on TPU): they feed bf16 MXU matmuls
    # anyway, and the f32 intermediates measurably pressure HBM at batch 32
    z_s = jnp.einsum("bhid,khd->bhik", qv, w_s.astype(qv.dtype),
                     preferred_element_type=jnp.float32).astype(qv.dtype)
    z_c = jnp.einsum("bhid,khd->bhik", qv, w_c.astype(qv.dtype),
                     preferred_element_type=jnp.float32).astype(qv.dtype)
    si = sin_p[None, None].astype(qv.dtype)
    ci = cos_p[None, None].astype(qv.dtype)
    a = z_s * si + z_c * ci
    b = z_c * si - z_s * ci
    return (jnp.einsum("bhik,jk->bhij", a, cos_p.astype(qv.dtype),
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bhik,jk->bhij", b, sin_p.astype(qv.dtype),
                         preferred_element_type=jnp.float32))


def xl_self_attention(params: dict, x: jax.Array, num_heads: int, *,
                      bias: Optional[jax.Array] = None) -> jax.Array:
    """scores = ((q+u)·k^T + (q+v)·r(i-j)^T) / sqrt(dh)."""
    B, T, D = x.shape
    H = num_heads
    dh = D // H
    q = _split_heads(linear(params["q_proj"], x), H)
    k = _split_heads(linear(params["k_proj"], x), H)
    v = _split_heads(linear(params["v_proj"], x), H)
    u = params["u_bias"].astype(x.dtype)[None, :, None, :]
    vb = params["v_bias"].astype(x.dtype)[None, :, None, :]
    bd = _xl_rel_bias(q + vb, params["r_proj"]["weight"])
    scale = 1.0 / math.sqrt(dh)
    # routed through _sdpa so the TPU flash kernel applies; extra_logits is
    # the post-scale additive term, hence bd * scale
    out = _sdpa(q + u, k, v, bias, extra_logits=bd * scale, scale=scale)
    return linear(params["output_proj"], _merge_heads(out))
