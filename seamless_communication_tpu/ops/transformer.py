"""Generic pre-LN transformer encoder/decoder stacks (the NLLB text model family,
AR T2U, and the monotonic decoder all instantiate these).

Reference semantics: fairseq2 StandardTransformerEncoder/Decoder as specified in C++
(ggml/examples/unity/fairseq2.cpp:917-1095); conventions checkpoint-validated against
HF SeamlessM4T(v2) text encoder/decoder.

Layer math (pre-LN):
    x += self_attn(LN(x))
    x += cross_attn(LN(x), enc)      # decoder only
    x += ffn(LN(x))
final stack LayerNorm at the top of encoder and decoder.

Both a full-sequence forward (training, encoder, re-decode passes) and a KV-cached
single-step forward (beam search / streaming) are provided. Layers are scan-stacked.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.attention import KVCache
from seamless_communication_tpu.ops.masks import causal_mask, combine_masks, padding_bias
from seamless_communication_tpu.ops.modules import (
    embedding, layer_norm, layer_norm_init, linear, linear_init,
)
from seamless_communication_tpu.ops.positional import apply_sinusoidal_pos
from seamless_communication_tpu.ops import remat


class TransformerConfig(NamedTuple):
    dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_inner_dim: int = 8192
    activation: str = "relu"       # NLLB: relu; expressive NLLB variant: gelu
    vocab_size: int = 256102
    pad_idx: int = 0
    max_seq_len: int = 4096
    has_cross_attention: bool = False
    layer_norm_embed: bool = False  # some frontends LN after pos encoding


def _act(name: str):
    return {"relu": jax.nn.relu, "gelu": jax.nn.gelu, "swish": lambda x: x * jax.nn.sigmoid(x)}[name]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def ffn_init(key, dim, inner, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "layer_norm": layer_norm_init(dim, dtype=dtype),
        "inner_proj": linear_init(k1, dim, inner, dtype=dtype),
        "output_proj": linear_init(k2, inner, dim, dtype=dtype),
    }


def transformer_layer_init(key: jax.Array, cfg: TransformerConfig, *,
                           dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    p = {
        "self_attn_layer_norm": layer_norm_init(cfg.dim, dtype=dtype),
        "self_attn": attn_ops.mha_init(ks[0], cfg.dim, cfg.num_heads, dtype=dtype),
        "ffn": ffn_init(ks[1], cfg.dim, cfg.ffn_inner_dim, dtype),
    }
    if cfg.has_cross_attention:
        p["cross_attn_layer_norm"] = layer_norm_init(cfg.dim, dtype=dtype)
        p["cross_attn"] = attn_ops.mha_init(ks[2], cfg.dim, cfg.num_heads, dtype=dtype)
    return p


def transformer_stack_init(key: jax.Array, cfg: TransformerConfig, *,
                           dtype=jnp.float32) -> dict:
    keys = jax.random.split(key, cfg.num_layers)
    layers = [transformer_layer_init(k, cfg, dtype=dtype) for k in keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {"layers": stacked, "layer_norm": layer_norm_init(cfg.dim, dtype=dtype)}


# ---------------------------------------------------------------------------
# full-sequence forward
# ---------------------------------------------------------------------------

def _layer_forward(p: dict, x: jax.Array, cfg: TransformerConfig, *,
                   self_bias: Optional[jax.Array],
                   enc_out: Optional[jax.Array],
                   cross_bias: Optional[jax.Array]) -> jax.Array:
    h = layer_norm(p["self_attn_layer_norm"], x)
    x = x + attn_ops.multi_head_attention(p["self_attn"], h, h, cfg.num_heads,
                                          bias=self_bias)
    if enc_out is not None:
        h = layer_norm(p["cross_attn_layer_norm"], x)
        x = x + attn_ops.multi_head_attention(p["cross_attn"], h, enc_out,
                                              cfg.num_heads, bias=cross_bias)
    h = layer_norm(p["ffn"]["layer_norm"], x)
    h = _act(cfg.activation)(linear(p["ffn"]["inner_proj"], h))
    return x + linear(p["ffn"]["output_proj"], h)


def transformer_encoder(params: dict, x: jax.Array, cfg: TransformerConfig, *,
                        padding_mask: Optional[jax.Array] = None) -> jax.Array:
    bias = padding_bias(padding_mask)

    from seamless_communication_tpu.parallel.pipeline import pipeline_or_none
    piped = pipeline_or_none(
        lambda h, tens, lp: _layer_forward(lp, h, cfg,
                                           self_bias=tens.get("bias"),
                                           enc_out=None, cross_bias=None),
        params["layers"], x, {"bias": bias})
    if piped is not None:
        return layer_norm(params["layer_norm"], piped)

    def body(h, layer_p):
        return _layer_forward(layer_p, h, cfg, self_bias=bias, enc_out=None,
                              cross_bias=None), None

    out, _ = jax.lax.scan(remat.maybe_checkpoint(body), x, params["layers"])
    return layer_norm(params["layer_norm"], out)


def transformer_decoder(params: dict, x: jax.Array, cfg: TransformerConfig, *,
                        enc_out: jax.Array,
                        enc_padding_mask: Optional[jax.Array] = None,
                        self_padding_mask: Optional[jax.Array] = None,
                        causal: bool = True) -> jax.Array:
    """Full-sequence decoder pass (training / text re-decode for T2U features,
    reference generator.py:294-299)."""
    T = x.shape[1]
    self_bias = combine_masks(
        causal_mask(T)[None, None] if causal else None,
        padding_bias(self_padding_mask),
    )
    cross_bias = padding_bias(enc_padding_mask)

    from seamless_communication_tpu.parallel.pipeline import pipeline_or_none
    piped = pipeline_or_none(
        lambda h, tens, lp: _layer_forward(lp, h, cfg,
                                           self_bias=tens.get("self_bias"),
                                           enc_out=tens.get("enc_out"),
                                           cross_bias=tens.get("cross_bias")),
        params["layers"], x, {"self_bias": self_bias, "enc_out": enc_out,
                              "cross_bias": cross_bias})
    if piped is not None:
        return layer_norm(params["layer_norm"], piped)

    def body(h, layer_p):
        return _layer_forward(layer_p, h, cfg, self_bias=self_bias, enc_out=enc_out,
                              cross_bias=cross_bias), None

    out, _ = jax.lax.scan(remat.maybe_checkpoint(body), x, params["layers"])
    return layer_norm(params["layer_norm"], out)


# ---------------------------------------------------------------------------
# KV-cached decode step
# ---------------------------------------------------------------------------

class DecoderCache(NamedTuple):
    """Per-stack carried state: stacked (L, B, H, T_max, Dh) self-attn KV plus
    precomputed (L, B, H, S, Dh) cross-attn KV."""
    self_k: jax.Array
    self_v: jax.Array
    cross_k: jax.Array
    cross_v: jax.Array


class DecoderCacheQ8(NamedTuple):
    """int8 variant of DecoderCache (per-row scales; ops/attention.py
    Int8KVCache): ~half the per-step KV HBM traffic at bf16-comparable
    output quality.

    ``row_src`` (per-layer caches only): a (B, T_max) int32 row-origin table
    enabling LAZY beam reorder — the KV buffers are never physically permuted;
    attention reads row t of logical beam b from physical slot
    ``row_src[b, t]`` (ops/kernels/decode_attention.py indexed kernel). The
    table is shared by all layers (every layer reorders identically)."""
    self_k: jax.Array        # (L, B, H, T_max, Dh) int8
    self_v: jax.Array
    self_k_scale: jax.Array  # (L, B, H, T_max) fp32
    self_v_scale: jax.Array
    cross_k: jax.Array       # (L, B, H, S, Dh) int8
    cross_v: jax.Array
    cross_k_scale: jax.Array
    cross_v_scale: jax.Array
    row_src: Optional[jax.Array] = None   # (B, T_max) int32


class DecoderCacheQ4(NamedTuple):
    """Packed-int4 self-KV variant of DecoderCacheQ8: self_k/self_v hold TWO
    int4 values per byte in split-half order (ops/attention.py
    quantize_kv_rows_int4), halving the dominant per-step KV HBM read again
    vs int8. Cross-attention KV stays int8 (precomputed once; its per-step
    read is small and the encoder bank is reused by every step). Per-layer
    (tuple) layout only — the serving decode path."""
    self_k: tuple            # L x (B, H, T_max, Dh/2) int8 packed
    self_v: tuple
    self_k_scale: tuple      # L x (B, H, T_max) fp32
    self_v_scale: tuple
    cross_k: tuple           # L x (B, H, S, Dh) int8
    cross_v: tuple
    cross_k_scale: tuple
    cross_v_scale: tuple


def decoder_cache_init(params: dict, cfg: TransformerConfig, enc_out: jax.Array,
                       max_len: int, dtype=None, *, kv_int8: bool = False,
                       per_layer: bool = False, kv_bits: int = 8):
    """``per_layer=True`` stores each field as a TUPLE of per-layer arrays
    (B, H, T, Dh) instead of one stacked (L, B, H, T, Dh) array, and the decode
    step unrolls the layer loop. On TPU this is the fast decode layout: the
    stacked form makes the layer-scan want an L-major cache layout while the
    beam reorder wants B-major, so XLA inserts two full-cache relayout copies
    per step (~0.65 ms/step on the v5e S2ST bench) and lowers the beam gather
    to a sequential per-beam loop (~0.9 ms/step). Per-layer caches gather on
    the contiguous leading beam axis and keep one layout throughout."""
    dtype = dtype or enc_out.dtype
    B = enc_out.shape[0]
    H = cfg.num_heads
    Dh = cfg.dim // H
    L = cfg.num_layers
    shape = (L, B, H, max_len, Dh)

    if per_layer:
        layer_ps = [jax.tree.map(lambda a, i=i: a[i], params["layers"])
                    for i in range(L)]
        zk = lambda: tuple(jnp.zeros(shape[1:], jnp.int8 if kv_int8 else dtype)
                           for _ in range(L))
        if kv_int8:
            cross = [attn_ops.cross_attention_precompute_int8(
                lp["cross_attn"], enc_out, H) for lp in layer_ps]
            zs = lambda: tuple(jnp.zeros(shape[1:4], jnp.float32)
                               for _ in range(L))
            if kv_bits == 4:
                zk4 = lambda: tuple(
                    jnp.zeros(shape[1:4] + (Dh // 2,), jnp.int8)
                    for _ in range(L))
                return DecoderCacheQ4(
                    zk4(), zk4(), zs(), zs(),
                    tuple(c.k for c in cross), tuple(c.v for c in cross),
                    tuple(c.k_scale for c in cross),
                    tuple(c.v_scale for c in cross))
            # identity row-origin table for LAZY beam reorder (see
            # DecoderCacheQ8.row_src), OPT-IN via SEAMLESS_LAZY_REORDER=1.
            # The round-3 default flip to the one-hot lazy formulation was
            # REVERTED after isolated on-device A/B (scripts/ab_lazy_reorder.py
            # single-mode runs): classic fused-gather 1.97 ms/step vs one-hot
            # 2.77 at v2-large beam-5 — the one-hot's extra B x MXU logit work
            # is NOT free at (5,16,262) shapes, and co-loading both
            # executables in one process degrades both to ~2.74 (HBM
            # co-residency), which had masked the regression in the original
            # interleaved A/B (docs/performance.md). The lazy path stays
            # available (exactness equality-tested) and still caps at the
            # one-hot 64 MB intermediate; decoder_cache_beam_reorder composes
            # through the table if a row_src-carrying cache is physically
            # reordered (test-only path).
            row_src = None
            if os.environ.get("SEAMLESS_LAZY_REORDER", "0") == "1":
                row_src = jnp.broadcast_to(
                    jnp.arange(B, dtype=jnp.int32)[:, None], (B, max_len))
            return DecoderCacheQ8(
                zk(), zk(), zs(), zs(),
                tuple(c.k for c in cross), tuple(c.v for c in cross),
                tuple(c.k_scale for c in cross), tuple(c.v_scale for c in cross),
                row_src)
        cross = [attn_ops.cross_attention_precompute(lp["cross_attn"], enc_out, H)
                 for lp in layer_ps]
        return DecoderCache(zk(), zk(), tuple(c.k for c in cross),
                            tuple(c.v for c in cross))

    if kv_int8:
        def per_layer_cross_q8(layer_p):
            kv = attn_ops.cross_attention_precompute_int8(
                layer_p["cross_attn"], enc_out, H)
            return kv.k, kv.v, kv.k_scale, kv.v_scale

        ck, cv, cks, cvs = jax.vmap(per_layer_cross_q8, in_axes=(0,))(
            params["layers"])
        return DecoderCacheQ8(
            jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
            jnp.zeros(shape[:4], jnp.float32), jnp.zeros(shape[:4], jnp.float32),
            ck, cv, cks, cvs)

    def per_layer_cross(layer_p):
        kv = attn_ops.cross_attention_precompute(layer_p["cross_attn"], enc_out, H)
        return kv.k, kv.v

    cross_k, cross_v = jax.vmap(per_layer_cross, in_axes=(0,))(params["layers"])
    return DecoderCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), cross_k, cross_v)


def unstack_layer_params(stack_params: dict) -> dict:
    """Return ``stack_params`` with an added ``layers_unstacked`` LIST of
    per-layer dicts (``layers`` stays stacked for the scan paths).

    Call at trace time, outside a decode while-loop: the layer slices (and any
    MXU-layout relayouts) are then emitted once before the loop instead of
    every step (`_decoder_step_per_layer` prefers the unstacked form)."""
    layers = stack_params["layers"]
    if "layers_unstacked" in stack_params or isinstance(layers, (list, tuple)):
        return stack_params
    L = jax.tree.leaves(layers)[0].shape[0]
    return {**stack_params,
            "layers_unstacked": [jax.tree.map(lambda a, i=i: a[i], layers)
                                 for i in range(L)]}


def decoder_cache_beam_reorder(cache, flat_src: jax.Array):
    """Beam-search cache reorder: gather beam-switch sources on the beam axis
    (axis 1 of the (L, B*K, ...) self-attention KV). The cross-attention KV is
    identical across the K beams of a batch item (the encoder output is repeated
    K times before precompute), so it is left untouched — reordering it would be
    pure HBM traffic."""
    if isinstance(cache.self_k, (tuple, list)):
        # per-layer caches: gather on the leading (contiguous) beam axis
        take = lambda xs: tuple(x[flat_src] for x in xs)
        if isinstance(cache, DecoderCacheQ4):
            return cache._replace(
                self_k=take(cache.self_k), self_v=take(cache.self_v),
                self_k_scale=take(cache.self_k_scale),
                self_v_scale=take(cache.self_v_scale))
        if isinstance(cache, DecoderCacheQ8):
            if getattr(cache, "row_src", None) is not None:
                # lazy (row-origin) cache through a PHYSICAL reorder: gather
                # each row through the composed origin table and reset the
                # table to identity. With an identity table (the only state a
                # cache_reorder-mode search ever produces, since the lazy
                # branch needs beam_src) this equals the plain beam gather.
                rs = cache.row_src[flat_src]                       # (B, T)
                idx4 = rs[:, None, :, None]
                idx3 = rs[:, None, :]
                take4 = lambda xs: tuple(
                    jnp.take_along_axis(x, idx4, axis=0) for x in xs)
                take3 = lambda xs: tuple(
                    jnp.take_along_axis(x, idx3, axis=0) for x in xs)
                B = rs.shape[0]
                ident = jnp.broadcast_to(
                    jnp.arange(B, dtype=jnp.int32)[:, None], rs.shape)
                return cache._replace(
                    self_k=take4(cache.self_k), self_v=take4(cache.self_v),
                    self_k_scale=take3(cache.self_k_scale),
                    self_v_scale=take3(cache.self_v_scale),
                    row_src=ident)
            return cache._replace(
                self_k=take(cache.self_k), self_v=take(cache.self_v),
                self_k_scale=take(cache.self_k_scale),
                self_v_scale=take(cache.self_v_scale))
        return cache._replace(self_k=take(cache.self_k),
                              self_v=take(cache.self_v))
    if isinstance(cache, DecoderCacheQ8):
        return cache._replace(
            self_k=jnp.take(cache.self_k, flat_src, axis=1),
            self_v=jnp.take(cache.self_v, flat_src, axis=1),
            self_k_scale=jnp.take(cache.self_k_scale, flat_src, axis=1),
            self_v_scale=jnp.take(cache.self_v_scale, flat_src, axis=1))
    return cache._replace(self_k=jnp.take(cache.self_k, flat_src, axis=1),
                          self_v=jnp.take(cache.self_v, flat_src, axis=1))


def transformer_decoder_step(params: dict, x_t: jax.Array, cache, step: jax.Array,
                             cfg: TransformerConfig, *,
                             enc_padding_mask: Optional[jax.Array] = None,
                             beam_src: Optional[jax.Array] = None):
    """One decode step. ``x_t``: (B, 1, D) embedded current token. Scans over layers
    carrying x_t; per-layer KV caches live in ``cache`` (DecoderCache or
    DecoderCacheQ8) with leading layer axis.

    ``beam_src``: optional (B,) beam-origin permutation from the PREVIOUS beam
    selection (per-layer caches only). When given, the beam reorder is fused
    into this step: history is read through the gather and the current row is
    spliced in with one select over the gathered buffer — one cache pass
    instead of a separate gather plus a read-modify-write row update (the two
    together profiled at ~1.4 ms/step on the v5e S2ST bench)."""
    cross_bias = padding_bias(enc_padding_mask)
    int4 = isinstance(cache, DecoderCacheQ4)
    int8 = isinstance(cache, DecoderCacheQ8) or int4

    if isinstance(cache.self_k, (tuple, list)):
        return _decoder_step_per_layer(params, x_t, cache, step, cfg,
                                       cross_bias, int8, beam_src,
                                       int4=int4)
    if beam_src is not None:
        return _decoder_step_scan_src(params, x_t, cache, step, cfg,
                                      cross_bias, int8, beam_src)

    # The per-layer scan only READS the cache (xs) and emits the current
    # position's tiny (B,H,1,Dh) K/V rows (ys); the full cache is updated with
    # ONE dynamic-update-slice afterwards. Threading the whole cache through
    # scan outputs copied it every step — measured ~2.3 ms/step of pure KV
    # copies on the v5e S2ST bench (copy_bitcast/copy_dus fusions), the single
    # largest decode cost.
    def body(h, scanned):
        if int8:
            layer_p, sk, sv, sks, svs, ck, cv, cks, cvs = scanned
            cross_kv = attn_ops.Int8KVCache(ck, cv, cks, cvs)
        else:
            layer_p, sk, sv, ck, cv = scanned
            cross_kv = KVCache(ck, cv)
        z = layer_norm(layer_p["self_attn_layer_norm"], h)
        if int8:
            y, kq, ks, vq, vs = attn_ops.self_attention_step_nocache_int8(
                layer_p["self_attn"], z, sk, sv, sks, svs, step, cfg.num_heads)
            new_rows = (kq, ks, vq, vs)
        else:
            y, k_t, v_t = attn_ops.self_attention_step_nocache(
                layer_p["self_attn"], z, sk, sv, step, cfg.num_heads)
            new_rows = (k_t.astype(sk.dtype), v_t.astype(sv.dtype))
        h = h + y
        z = layer_norm(layer_p["cross_attn_layer_norm"], h)
        if int8:
            h = h + attn_ops.cross_attention_step_int8(
                layer_p["cross_attn"], z, cross_kv, cfg.num_heads,
                bias=cross_bias)
        else:
            h = h + attn_ops.cross_attention_step(layer_p["cross_attn"], z,
                                                  cross_kv, cfg.num_heads,
                                                  bias=cross_bias)
        z = layer_norm(layer_p["ffn"]["layer_norm"], h)
        z = _act(cfg.activation)(linear(layer_p["ffn"]["inner_proj"], z))
        h = h + linear(layer_p["ffn"]["output_proj"], z)
        return h, new_rows

    # unrolling the per-layer scan lets XLA software-pipeline the next layer's
    # weight loads behind the current layer's compute (decode is HBM-bound)
    unroll = int(os.environ.get("SEAMLESS_DECODE_UNROLL", "1"))
    if int8:
        out, (new_k, new_ks, new_v, new_vs) = jax.lax.scan(
            body, x_t,
            (params["layers"], cache.self_k, cache.self_v, cache.self_k_scale,
             cache.self_v_scale, cache.cross_k, cache.cross_v,
             cache.cross_k_scale, cache.cross_v_scale), unroll=unroll)
        out = layer_norm(params["layer_norm"], out)
        # new_k/new_v: (L,B,H,1,Dh); scales (L,B,H,1) — one in-place update each
        self_k = jax.lax.dynamic_update_slice(cache.self_k, new_k,
                                              (0, 0, 0, step, 0))
        self_v = jax.lax.dynamic_update_slice(cache.self_v, new_v,
                                              (0, 0, 0, step, 0))
        self_ks = jax.lax.dynamic_update_slice(cache.self_k_scale, new_ks,
                                               (0, 0, 0, step))
        self_vs = jax.lax.dynamic_update_slice(cache.self_v_scale, new_vs,
                                               (0, 0, 0, step))
        return out, DecoderCacheQ8(self_k, self_v, self_ks, self_vs,
                                   cache.cross_k, cache.cross_v,
                                   cache.cross_k_scale, cache.cross_v_scale)
    out, (new_k, new_v) = jax.lax.scan(
        body, x_t,
        (params["layers"], cache.self_k, cache.self_v, cache.cross_k, cache.cross_v),
        unroll=unroll)
    out = layer_norm(params["layer_norm"], out)
    self_k = jax.lax.dynamic_update_slice(cache.self_k, new_k, (0, 0, 0, step, 0))
    self_v = jax.lax.dynamic_update_slice(cache.self_v, new_v, (0, 0, 0, step, 0))
    return out, DecoderCache(self_k, self_v, cache.cross_k, cache.cross_v)


def _pallas_decode_enabled() -> bool:
    """The fused decode-attention kernel runs only on real TPU (Mosaic);
    SEAMLESS_PALLAS_DECODE=0 opts out. CPU keeps the plain-XLA composition so
    hermetic tests stay bit-identical."""
    if os.environ.get("SEAMLESS_PALLAS_DECODE") == "0":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _decoder_step_scan_src(params: dict, x_t: jax.Array, cache,
                           step: jax.Array, cfg: TransformerConfig,
                           cross_bias, int8: bool, beam_src: jax.Array):
    """Stacked-cache decode step with the beam reorder fused into the layer
    scan: each layer's cache slice is gathered by ``beam_src``, the new KV row
    is selected in, and the result is emitted as the scan output — the whole
    cache is read and written exactly once per step, in one compiled scan body
    (compiles ~5x faster than unrolling the fused layers)."""
    T = cache.self_k.shape[3]
    pos_is_step = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, 1), 2) == step

    def body(h, scanned):
        if int8:
            layer_p, sk, sv, sks, svs, ck, cv, cks, cvs = scanned
            cross_kv = attn_ops.Int8KVCache(ck, cv, cks, cvs)
        else:
            layer_p, sk, sv, ck, cv = scanned
            cross_kv = KVCache(ck, cv)
        z = layer_norm(layer_p["self_attn_layer_norm"], h)
        sk, sv = sk[beam_src], sv[beam_src]
        if int8:
            sks, svs = sks[beam_src], svs[beam_src]
            y, kq, ks, vq, vs = attn_ops.self_attention_step_nocache_int8(
                layer_p["self_attn"], z, sk, sv, sks, svs, step, cfg.num_heads)
            new_cache = (jnp.where(pos_is_step, kq, sk),
                         jnp.where(pos_is_step, vq, sv),
                         jnp.where(pos_is_step[..., 0], ks, sks),
                         jnp.where(pos_is_step[..., 0], vs, svs))
        else:
            y, k_t, v_t = attn_ops.self_attention_step_nocache(
                layer_p["self_attn"], z, sk, sv, step, cfg.num_heads)
            new_cache = (jnp.where(pos_is_step, k_t.astype(sk.dtype), sk),
                         jnp.where(pos_is_step, v_t.astype(sv.dtype), sv))
        h = h + y
        z = layer_norm(layer_p["cross_attn_layer_norm"], h)
        if int8:
            h = h + attn_ops.cross_attention_step_int8(
                layer_p["cross_attn"], z, cross_kv, cfg.num_heads,
                bias=cross_bias)
        else:
            h = h + attn_ops.cross_attention_step(
                layer_p["cross_attn"], z, cross_kv, cfg.num_heads,
                bias=cross_bias)
        z = layer_norm(layer_p["ffn"]["layer_norm"], h)
        z = _act(cfg.activation)(linear(layer_p["ffn"]["inner_proj"], z))
        h = h + linear(layer_p["ffn"]["output_proj"], z)
        return h, new_cache

    unroll = int(os.environ.get("SEAMLESS_DECODE_UNROLL", "1"))
    if int8:
        out, (nk, nv, nks, nvs) = jax.lax.scan(
            body, x_t,
            (params["layers"], cache.self_k, cache.self_v, cache.self_k_scale,
             cache.self_v_scale, cache.cross_k, cache.cross_v,
             cache.cross_k_scale, cache.cross_v_scale), unroll=unroll)
        out = layer_norm(params["layer_norm"], out)
        return out, cache._replace(self_k=nk, self_v=nv,
                                   self_k_scale=nks, self_v_scale=nvs)
    out, (nk, nv) = jax.lax.scan(
        body, x_t,
        (params["layers"], cache.self_k, cache.self_v, cache.cross_k,
         cache.cross_v), unroll=unroll)
    out = layer_norm(params["layer_norm"], out)
    return out, cache._replace(self_k=nk, self_v=nv)


def _decoder_step_per_layer(params: dict, x_t: jax.Array, cache,
                            step: jax.Array, cfg: TransformerConfig,
                            cross_bias, int8: bool,
                            beam_src: Optional[jax.Array] = None,
                            int4: bool = False):
    """Unrolled-layer decode step over tuple-of-(B,H,T,Dh) caches (see
    decoder_cache_init(per_layer=True)). Math-identical to the scan path; the
    per-layer weight slices are loop-invariant and hoisted out of the
    surrounding decode while_loop by XLA."""
    L = len(cache.self_k)
    h = x_t
    sk, sv = list(cache.self_k), list(cache.self_v)
    if int8:
        sks, svs = list(cache.self_k_scale), list(cache.self_v_scale)
    T = sk[0].shape[2]
    pos_is_step = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T, 1), 2) == step
    # Lazy (row-origin indexed) reorder is OPT-IN (SEAMLESS_LAZY_REORDER=1;
    # decoder_cache_init materializes row_src only then): the vectorized
    # one-hot formulation (decode_attention._indexed_onehot, exact —
    # equality-tested against the physical gather) eliminates the physical
    # cache permutation + carry copies, but its extra B x MXU logit work
    # measured SLOWER in isolation (2.77 vs the classic path's 1.97 ms/step,
    # v2-large beam-5, scripts/ab_lazy_reorder.py single-mode runs;
    # docs/performance.md). The earlier serial Pallas indexed kernel was
    # slower still (0.89 vs 0.44 ms/step attention).
    lazy = (int8 and not int4 and beam_src is not None
            and getattr(cache, "row_src", None) is not None
            and os.environ.get("SEAMLESS_LAZY_REORDER", "1") == "1")
    if lazy:
        # lazy beam reorder: inherit the source beam's row-origin history and
        # stamp this step's row as locally-written; the KV buffers themselves
        # are never permuted (see DecoderCacheQ8.row_src)
        B = x_t.shape[0]
        row_src = jnp.take(cache.row_src, beam_src, axis=0)
        row_src = jax.lax.dynamic_update_slice(
            row_src, jnp.arange(B, dtype=jnp.int32)[:, None], (0, step))
    unstacked = params.get("layers_unstacked")
    for i in range(L):
        # pre-unstacked layer params (unstack_layer_params) avoid re-slicing +
        # relayouting the stacked weights INSIDE the decode while-loop every
        # step (~0.15 ms/step of s8 slice fusions on the v2-large bench)
        lp = (unstacked[i] if unstacked is not None
              else jax.tree.map(lambda a: a[i], params["layers"]))
        z = layer_norm(lp["self_attn_layer_norm"], h)
        if lazy:
            # indexed decode attention: one cache read, no permuted write-back
            # (ops/kernels/decode_attention.py indexed kernel; XLA fallback is
            # math-identical)
            from seamless_communication_tpu.ops.kernels.decode_attention import (
                indexed_decode_self_attention_int8,
            )
            ap = lp["self_attn"]
            qh = attn_ops._split_heads(linear(ap["q_proj"], z),
                                       cfg.num_heads)[:, :, 0]
            kh = attn_ops._split_heads(linear(ap["k_proj"], z),
                                       cfg.num_heads)[:, :, 0]
            vh = attn_ops._split_heads(linear(ap["v_proj"], z),
                                       cfg.num_heads)[:, :, 0]
            o = indexed_decode_self_attention_int8(
                qh, kh, vh, sk[i], sv[i], sks[i], svs[i], row_src, step)
            # the ONLY cache write: this beam's own new row at [b, :, step]
            kq, ksc = attn_ops.quantize_kv_rows(kh)
            vq, vsc = attn_ops.quantize_kv_rows(vh)
            sk[i] = jax.lax.dynamic_update_slice(
                sk[i], kq[:, :, None, :], (0, 0, step, 0))
            sv[i] = jax.lax.dynamic_update_slice(
                sv[i], vq[:, :, None, :], (0, 0, step, 0))
            sks[i] = jax.lax.dynamic_update_slice(
                sks[i], ksc[:, :, None], (0, 0, step))
            svs[i] = jax.lax.dynamic_update_slice(
                svs[i], vsc[:, :, None], (0, 0, step))
            y = linear(ap["output_proj"], attn_ops._merge_heads(o[:, :, None]))
        elif beam_src is not None and int8 and _pallas_decode_enabled():
            # Pallas fast path: gather + row insert + attention in ONE VMEM
            # pass per beam (ops/kernels/decode_attention.py); the int4
            # variant reads/writes packed nibbles — half the KV traffic
            from seamless_communication_tpu.ops.kernels.decode_attention import (
                fused_decode_self_attention_int4,
                fused_decode_self_attention_int8,
            )
            ap = lp["self_attn"]
            qh = attn_ops._split_heads(linear(ap["q_proj"], z),
                                       cfg.num_heads)[:, :, 0]
            kh = attn_ops._split_heads(linear(ap["k_proj"], z),
                                       cfg.num_heads)[:, :, 0]
            vh = attn_ops._split_heads(linear(ap["v_proj"], z),
                                       cfg.num_heads)[:, :, 0]
            fused = (fused_decode_self_attention_int4 if int4
                     else fused_decode_self_attention_int8)
            o, sk[i], sv[i], sks[i], svs[i] = fused(
                qh, kh, vh, sk[i], sv[i], sks[i], svs[i], step, beam_src,
                use_pallas=True)
            y = linear(ap["output_proj"], attn_ops._merge_heads(o[:, :, None]))
        elif int4:
            if beam_src is not None:
                ski, svi = sk[i][beam_src], sv[i][beam_src]
                sksi, svsi = sks[i][beam_src], svs[i][beam_src]
            else:
                ski, svi, sksi, svsi = sk[i], sv[i], sks[i], svs[i]
            y, kq, ks, vq, vs = attn_ops.self_attention_step_nocache_int4(
                lp["self_attn"], z, ski, svi, sksi, svsi, step,
                cfg.num_heads)
            if beam_src is not None:
                sk[i] = jnp.where(pos_is_step, kq, ski)
                sv[i] = jnp.where(pos_is_step, vq, svi)
                sks[i] = jnp.where(pos_is_step[..., 0], ks, sksi)
                svs[i] = jnp.where(pos_is_step[..., 0], vs, svsi)
            else:
                sk[i] = jax.lax.dynamic_update_slice(ski, kq, (0, 0, step, 0))
                sv[i] = jax.lax.dynamic_update_slice(svi, vq, (0, 0, step, 0))
                sks[i] = jax.lax.dynamic_update_slice(sksi, ks, (0, 0, step))
                svs[i] = jax.lax.dynamic_update_slice(svsi, vs, (0, 0, step))
        elif int8:
            if beam_src is not None:
                # fused reorder: the gathered history feeds both the attention
                # read and (with the new row selected in) the cache write
                ski, svi = sk[i][beam_src], sv[i][beam_src]
                sksi, svsi = sks[i][beam_src], svs[i][beam_src]
            else:
                ski, svi, sksi, svsi = sk[i], sv[i], sks[i], svs[i]
            y, kq, ks, vq, vs = attn_ops.self_attention_step_nocache_int8(
                lp["self_attn"], z, ski, svi, sksi, svsi, step,
                cfg.num_heads)
            if beam_src is not None:
                sk[i] = jnp.where(pos_is_step, kq, ski)
                sv[i] = jnp.where(pos_is_step, vq, svi)
                sks[i] = jnp.where(pos_is_step[..., 0], ks, sksi)
                svs[i] = jnp.where(pos_is_step[..., 0], vs, svsi)
            else:
                sk[i] = jax.lax.dynamic_update_slice(ski, kq, (0, 0, step, 0))
                sv[i] = jax.lax.dynamic_update_slice(svi, vq, (0, 0, step, 0))
                sks[i] = jax.lax.dynamic_update_slice(sksi, ks, (0, 0, step))
                svs[i] = jax.lax.dynamic_update_slice(svsi, vs, (0, 0, step))
        else:
            if beam_src is not None:
                ski, svi = sk[i][beam_src], sv[i][beam_src]
            else:
                ski, svi = sk[i], sv[i]
            y, k_t, v_t = attn_ops.self_attention_step_nocache(
                lp["self_attn"], z, ski, svi, step, cfg.num_heads)
            if beam_src is not None:
                sk[i] = jnp.where(pos_is_step, k_t.astype(ski.dtype), ski)
                sv[i] = jnp.where(pos_is_step, v_t.astype(svi.dtype), svi)
            else:
                sk[i] = jax.lax.dynamic_update_slice(
                    ski, k_t.astype(ski.dtype), (0, 0, step, 0))
                sv[i] = jax.lax.dynamic_update_slice(
                    svi, v_t.astype(svi.dtype), (0, 0, step, 0))
        h = h + y
        z = layer_norm(lp["cross_attn_layer_norm"], h)
        if int8:
            cross_kv = attn_ops.Int8KVCache(
                cache.cross_k[i], cache.cross_v[i],
                cache.cross_k_scale[i], cache.cross_v_scale[i])
            h = h + attn_ops.cross_attention_step_int8(
                lp["cross_attn"], z, cross_kv, cfg.num_heads, bias=cross_bias)
        else:
            cross_kv = KVCache(cache.cross_k[i], cache.cross_v[i])
            h = h + attn_ops.cross_attention_step(
                lp["cross_attn"], z, cross_kv, cfg.num_heads, bias=cross_bias)
        z = layer_norm(lp["ffn"]["layer_norm"], h)
        z = _act(cfg.activation)(linear(lp["ffn"]["inner_proj"], z))
        h = h + linear(lp["ffn"]["output_proj"], z)
    out = layer_norm(params["layer_norm"], h)
    if lazy:
        return out, cache._replace(self_k=tuple(sk), self_v=tuple(sv),
                                   self_k_scale=tuple(sks),
                                   self_v_scale=tuple(svs),
                                   row_src=row_src)
    if int8:
        return out, cache._replace(self_k=tuple(sk), self_v=tuple(sv),
                                   self_k_scale=tuple(sks),
                                   self_v_scale=tuple(svs))
    return out, cache._replace(self_k=tuple(sk), self_v=tuple(sv))


# ---------------------------------------------------------------------------
# Embedding frontend (fairseq2 TransformerEmbeddingFrontend, fairseq2.cpp:917-960)
# ---------------------------------------------------------------------------

def embedding_frontend(embed_params: dict, ids: jax.Array, cfg: TransformerConfig, *,
                       padding_mask: Optional[jax.Array] = None,
                       start_step: int | jax.Array = 0,
                       ln_params: Optional[dict] = None) -> jax.Array:
    """ids -> scaled embeddings + sinusoidal positions (padding-aware, fairseq
    convention: positions offset by pad_idx + 1)."""
    x = embedding(embed_params, ids, scale=cfg.dim ** 0.5)
    x = apply_sinusoidal_pos(x, padding_mask=padding_mask, padding_idx=cfg.pad_idx,
                             start_step=start_step)
    if ln_params is not None:
        x = layer_norm(ln_params, x)
    return x


def tied_projection(embed_params: dict, x: jax.Array) -> jax.Array:
    """Logits via the tied embedding matrix (final_proj), fp32. Dispatches to the
    int8 row-quantized table when present."""
    if "embedding_i8" in embed_params:
        from seamless_communication_tpu.ops.quantization import (
            tied_projection_quantized,
        )
        return tied_projection_quantized(embed_params, x)
    if "embedding_i4" in embed_params:
        from seamless_communication_tpu.ops.quantization import (
            tied_projection_quantized_int4,
        )
        return tied_projection_quantized_int4(embed_params, x)
    w = embed_params["embedding"]
    return jnp.matmul(x, w.astype(x.dtype).T, preferred_element_type=jnp.float32)
