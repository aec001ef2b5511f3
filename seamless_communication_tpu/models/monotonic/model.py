"""EMMA monotonic text decoder for SeamlessStreaming
(reference models/monotonic_decoder/: builder.py:40-245, p_choose.py:17-148,
monotonic_decoder_layer.py:26-201, monotonic_decoder.py:29-99, model.py:23-66).

dense_1b arch: 24 pre-LN layers (self-attn, cross-attn + PChoose, ffn 8192),
energy_bias -0.5, monotonic temperature 0.2, 4-layer ReLU energy MLPs, keys
average-pooled by pre_decision_ratio=2.

The streaming policy consumes p_choose stacked over layers*heads
((L*H, S_tgt, S_src_pooled)); decoding is single-step KV-cached inside one compiled
program per step (SURVEY.md §7.7).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.attention import KVCache
from seamless_communication_tpu.ops.masks import causal_mask, padding_bias
from seamless_communication_tpu.ops.modules import (
    embedding_init, layer_norm, layer_norm_init, linear, linear_init,
)
from seamless_communication_tpu.ops.transformer import (
    embedding_frontend, tied_projection, TransformerConfig,
)


class MonotonicDecoderConfig(NamedTuple):
    model_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_inner_dim: int = 8192
    vocab_size: int = 256102
    pad_idx: int = 0
    eos_idx: int = 3
    unk_idx: int = 1
    max_seq_len: int = 4096
    energy_bias: float = -0.5
    monotonic_temperature: float = 0.2
    num_monotonic_energy_layers: int = 4
    pre_decision_ratio: int = 2

    def dec_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.model_dim, self.num_layers, self.num_heads,
                                 self.ffn_inner_dim, "relu", self.vocab_size,
                                 self.pad_idx, self.max_seq_len, True)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _energy_proj_init(key, dim, n_layers, dtype):
    ks = jax.random.split(key, n_layers)
    return [linear_init(k, dim, dim, dtype=dtype) for k in ks]


def _p_choose_init(key, cfg: MonotonicDecoderConfig, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "energy_bias": jnp.full((1,), cfg.energy_bias, dtype),
        "q_energy_proj": _energy_proj_init(k1, cfg.model_dim,
                                           cfg.num_monotonic_energy_layers, dtype),
        "k_energy_proj": _energy_proj_init(k2, cfg.model_dim,
                                           cfg.num_monotonic_energy_layers, dtype),
    }


def _layer_init(key, cfg: MonotonicDecoderConfig, dtype):
    ks = jax.random.split(key, 5)
    return {
        "self_attn_layer_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
        "self_attn": attn_ops.mha_init(ks[0], cfg.model_dim, cfg.num_heads, dtype=dtype),
        "cross_attn_layer_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
        "cross_attn": attn_ops.mha_init(ks[1], cfg.model_dim, cfg.num_heads, dtype=dtype),
        "p_choose": _p_choose_init(ks[2], cfg, dtype),
        "ffn": {
            "layer_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
            "inner_proj": linear_init(ks[3], cfg.model_dim, cfg.ffn_inner_dim, dtype=dtype),
            "output_proj": linear_init(ks[4], cfg.ffn_inner_dim, cfg.model_dim, dtype=dtype),
        },
    }


def monotonic_decoder_init(key: jax.Array, cfg: MonotonicDecoderConfig, *,
                           dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, cfg.num_layers + 2)
    layers = [_layer_init(k, cfg, dtype) for k in ks[:cfg.num_layers]]
    return {
        "embed": embedding_init(ks[-2], cfg.vocab_size, cfg.model_dim, dtype=dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "layer_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def _energy_proj(layers, x):
    for p in layers:
        x = jax.nn.relu(linear(p, x))
    return x


def pool_keys(enc_out: jax.Array, ratio: int) -> jax.Array:
    """Average-pool encoder keys by pre_decision_ratio (ceil mode)."""
    B, S, D = enc_out.shape
    pad = (-S) % ratio
    x = jnp.pad(enc_out, ((0, 0), (0, pad), (0, 0)))
    x = x.reshape(B, -1, ratio, D)
    # ceil-mode average: divide by actual element count in the last window
    counts = jnp.minimum(ratio, S - jnp.arange(x.shape[1]) * ratio)
    return jnp.sum(x, axis=2) / counts[None, :, None].astype(x.dtype)


def p_choose(params: dict, seqs: jax.Array, pooled_keys: jax.Array,
             cfg: MonotonicDecoderConfig) -> jax.Array:
    """(B, S, D) queries x (B, Sp, D) pooled keys -> (B, H, S, Sp) probabilities."""
    H = cfg.num_heads
    q = _energy_proj(params["q_energy_proj"], seqs)
    k = _energy_proj(params["k_energy_proj"], pooled_keys)
    B, S, D = q.shape
    dh = D // H
    qh = q.reshape(B, S, H, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, -1, H, dh).transpose(0, 2, 1, 3)
    energy = jnp.einsum("bhsd,bhpd->bhsp", qh, kh,
                        preferred_element_type=jnp.float32) * (dh ** -0.5)
    energy = energy + params["energy_bias"].astype(jnp.float32)
    return jax.nn.sigmoid(energy / cfg.monotonic_temperature)


# ---------------------------------------------------------------------------
# KV-cached decode step
# ---------------------------------------------------------------------------

class MonotonicCache(NamedTuple):
    self_k: jax.Array   # (L, B, H, T_max, Dh)
    self_v: jax.Array
    cross_k: jax.Array  # (L, B, H, S, Dh)
    cross_v: jax.Array
    pooled_keys: jax.Array  # (B, Sp, D) pooled encoder output (for p_choose)


def monotonic_decoder_cache(params: dict, cfg: MonotonicDecoderConfig,
                            enc_out: jax.Array, max_len: int) -> MonotonicCache:
    B = enc_out.shape[0]
    H, Dh = cfg.num_heads, cfg.model_dim // cfg.num_heads

    def per_layer(layer_p):
        kv = attn_ops.cross_attention_precompute(layer_p["cross_attn"], enc_out, H)
        return kv.k, kv.v

    ck, cv = jax.vmap(per_layer, in_axes=(0,))(params["layers"])
    shape = (cfg.num_layers, B, H, max_len, Dh)
    return MonotonicCache(jnp.zeros(shape, enc_out.dtype), jnp.zeros(shape, enc_out.dtype),
                          ck, cv, pool_keys(enc_out, cfg.pre_decision_ratio))


def monotonic_decode_step(params: dict, tok_t: jax.Array, cache: MonotonicCache,
                          step: jax.Array, cfg: MonotonicDecoderConfig, *,
                          enc_padding_mask: Optional[jax.Array] = None
                          ):
    """One step: tok_t (B, 1) -> ((B, V) fp32 logits, (B, 1, D) features,
    (B, L*H, Sp) p_choose, cache). Features feed the downstream NAR T2U
    (streaming UnitYMMATextDecoderAgent, online_text_decoder.py:394-444)."""
    x = embedding_frontend(params["embed"], tok_t, cfg.dec_cfg(), start_step=step)
    cross_bias = padding_bias(enc_padding_mask)

    # read-only cache scan + ONE dynamic-update-slice per step: threading the
    # full cache through scan outputs copies it every step (same fix as
    # ops/transformer.py transformer_decoder_step / docs/performance.md)
    def body(h, scanned):
        layer_p, sk, sv, ck, cv = scanned
        z = layer_norm(layer_p["self_attn_layer_norm"], h)
        y, k_t, v_t = attn_ops.self_attention_step_nocache(
            layer_p["self_attn"], z, sk, sv, step, cfg.num_heads)
        h = h + y
        z = layer_norm(layer_p["cross_attn_layer_norm"], h)
        pc = p_choose(layer_p["p_choose"], z, cache.pooled_keys, cfg)  # (B,H,1,Sp)
        h = h + attn_ops.cross_attention_step(layer_p["cross_attn"], z,
                                              KVCache(ck, cv), cfg.num_heads,
                                              bias=cross_bias)
        z = layer_norm(layer_p["ffn"]["layer_norm"], h)
        z = jax.nn.relu(linear(layer_p["ffn"]["inner_proj"], z))
        h = h + linear(layer_p["ffn"]["output_proj"], z)
        return h, (k_t.astype(sk.dtype), v_t.astype(sv.dtype), pc[:, :, 0, :])

    out, (rk, rv, pcs) = jax.lax.scan(
        body, x, (params["layers"], cache.self_k, cache.self_v,
                  cache.cross_k, cache.cross_v))
    out = layer_norm(params["layer_norm"], out)
    logits = tied_projection(params["embed"], out)[:, 0]
    # (L, B, H, Sp) -> (B, L*H, Sp)
    L, B, H, Sp = pcs.shape
    pcs = pcs.transpose(1, 0, 2, 3).reshape(B, L * H, Sp)
    nk = jax.lax.dynamic_update_slice(cache.self_k, rk, (0, 0, 0, step, 0))
    nv = jax.lax.dynamic_update_slice(cache.self_v, rv, (0, 0, 0, step, 0))
    new_cache = MonotonicCache(nk, nv, cache.cross_k, cache.cross_v, cache.pooled_keys)
    return logits, out, pcs, new_cache


def monotonic_write_burst(params: dict, cache: MonotonicCache, start_step: jax.Array,
                          first_logits: jax.Array, first_pcs: jax.Array,
                          cfg: MonotonicDecoderConfig, *,
                          decision_threshold: float, decision_method: str,
                          p_choose_start_layer: int, sp_valid: jax.Array,
                          eos_idx: int, max_len: jax.Array, n_context: jax.Array,
                          max_writes: int, source_finished: bool,
                          enc_padding_mask=None, min_gen_len: int = 0):
    """Run the EMMA write loop ON DEVICE: starting from the prefill's last
    logits/p_choose, greedily emit up to ``max_writes`` tokens while the p_choose
    statistic clears ``decision_threshold`` (reference policy loop,
    online_text_decoder.py:303-387 — the stop conditions are reproduced exactly
    for the default no_early_stop=False, block_ngrams=False configuration).

    Returns (tokens (B=1 rows flattened -> (max_writes,)), feats (max_writes, D),
    n_written, finished, cache). One compiled program replaces up to
    ``max_writes`` host round-trips per streaming chunk."""
    B = first_logits.shape[0]
    D = cfg.model_dim
    H = cfg.num_heads

    def stat(pcs):
        pl = pcs.reshape(B, cfg.num_layers, H, -1)[:, p_choose_start_layer:, :, :]
        pl_last = jnp.take_along_axis(
            pl, (sp_valid - 1).reshape(1, 1, 1, 1).astype(jnp.int32), axis=-1)[..., 0]
        if decision_method == "min":
            return jnp.min(pl_last)
        if decision_method == "mean":
            return jnp.mean(pl_last)
        return jnp.median(pl_last.reshape(-1))

    def cond(s):
        cache, logits, pcs, n, step, done, finished, toks, feats = s
        return (~done) & (n < max_writes)

    def body(s):
        cache, logits, pcs, n, step, done, finished, toks, feats = s
        total = n_context - 2 + n  # generated tokens so far (minus [eos, lang])
        # optional minimum generation length (off by default — the reference
        # streaming policy has no min length): suppress EOS until satisfied
        lg = logits[0]
        if min_gen_len > 0:
            lg = jnp.where((jnp.arange(lg.shape[0]) == eos_idx)
                           & (total < min_gen_len), -jnp.inf, lg)
        index = jnp.argmax(lg).astype(jnp.int32)
        prob = stat(pcs)
        cur_len = n_context + n    # full target length incl prefix
        fin = ((index == eos_idx) | (cur_len > max_len)
               | (jnp.asarray(source_finished) & (cur_len >= max_len)))
        stop_read = (~jnp.asarray(source_finished)) & (prob < decision_threshold)
        stop_len = cur_len >= max_len
        do_write = ~(fin | stop_read | stop_len)

        new_logits, feat, new_pcs, new_cache = monotonic_decode_step(
            params, index.reshape(1, 1), cache, step, cfg,
            enc_padding_mask=enc_padding_mask)
        toks = jnp.where(do_write, toks.at[n].set(index), toks)
        feats = jnp.where(do_write, feats.at[n].set(feat[0, 0]), feats)
        cache = jax.tree.map(lambda new, old: jnp.where(do_write, new, old),
                             new_cache, cache)
        logits = jnp.where(do_write, new_logits, logits)
        pcs = jnp.where(do_write, new_pcs, pcs)
        n = jnp.where(do_write, n + 1, n)
        step = jnp.where(do_write, step + 1, step)
        done = ~do_write
        finished = fin
        return (cache, logits, pcs, n, step, done, finished, toks, feats)

    init = (cache, first_logits, first_pcs, jnp.asarray(0, jnp.int32), start_step,
            jnp.asarray(False), jnp.asarray(False),
            jnp.zeros((max_writes,), jnp.int32),
            jnp.zeros((max_writes, D), jnp.float32))
    cache, logits, pcs, n, step, done, finished, toks, feats = \
        jax.lax.while_loop(cond, body, init)
    return toks, feats, n, finished, cache


def monotonic_encode_and_prefill(params: dict, tokens: jax.Array,
                                 n_tokens: jax.Array, enc_out: jax.Array,
                                 max_len: int, cfg: MonotonicDecoderConfig, *,
                                 enc_padding_mask=None, parallel: bool = True):
    """Cache build + context prefill fused into one program (one device call per
    streaming chunk instead of two). ``parallel=True`` (default) uses the
    teacher-forced full-sequence prefill (one weight pass instead of one per
    context token); ``parallel=False`` keeps the sequential scan."""
    cache = monotonic_decoder_cache(params, cfg, enc_out, max_len)
    fn = monotonic_prefill_parallel if parallel else monotonic_prefill
    return fn(params, tokens, n_tokens, cache, cfg,
              enc_padding_mask=enc_padding_mask)


def monotonic_prefill(params: dict, tokens: jax.Array, n_tokens: jax.Array,
                      cache: MonotonicCache, cfg: MonotonicDecoderConfig, *,
                      enc_padding_mask=None):
    """Decode ``tokens`` (B, T) sequentially inside ONE compiled program
    (lax.scan over steps) — the streaming agents re-decode their full target
    prefix every chunk (reference online_text_decoder.py:317), and per-token host
    dispatch dominates latency on remote-attached TPUs.

    Returns (last logits (B, V), features (B, T, D), last p_choose (B, L*H, Sp),
    cache advanced by ``n_tokens`` steps. Steps >= n_tokens still execute and DO
    write stale rows at positions >= n_tokens (masking the write would cost a
    full-cache select per step); correctness relies on the overwrite-before-read
    invariant: callers must resume decoding at exactly step = n_tokens, so row s
    is rewritten before any step > s reads it (true for the B=1 write-burst
    caller ``monotonic_write_burst``)."""
    B, T = tokens.shape

    def body(carry, idx):
        cache, old_logits, old_pcs = carry
        tok_t = jax.lax.dynamic_slice_in_dim(tokens, idx, 1, axis=1)
        logits, feat, pcs, new_cache = monotonic_decode_step(
            params, tok_t, cache, idx, cfg, enc_padding_mask=enc_padding_mask)
        valid = idx < n_tokens
        # rows written by invalid steps (idx >= n_tokens) land at position idx
        # and are always overwritten before any valid read: the write burst
        # continues sequentially from start_step = n_tokens, writing row s
        # before any step > s reads it. Masking the cache write itself would
        # cost a full-cache select per prefill step (the dominant prefill
        # cost, cf. docs/performance.md on decode-path cache copies).
        logits = jnp.where(valid, logits, old_logits)
        pcs = jnp.where(valid, pcs, old_pcs)
        return (new_cache, logits, pcs), feat[:, 0]

    dummy_logits = jnp.zeros((B, cfg.vocab_size), jnp.float32)
    Sp = cache.pooled_keys.shape[1]
    dummy_pcs = jnp.zeros((B, cfg.num_layers * cfg.num_heads, Sp), jnp.float32)
    (cache, logits, pcs), feats = jax.lax.scan(
        body, (cache, dummy_logits, dummy_pcs), jnp.arange(T))
    return logits, feats.swapaxes(0, 1), pcs, cache


def monotonic_prefill_parallel(params: dict, tokens: jax.Array,
                               n_tokens: jax.Array, cache: MonotonicCache,
                               cfg: MonotonicDecoderConfig, *,
                               enc_padding_mask=None):
    """Teacher-forced FULL-SEQUENCE prefill — mathematically identical to the
    sequential :func:`monotonic_prefill` (causal self-attention computes the
    same per-position outputs) but reads the ~1B-param decoder weights ONCE
    instead of once per context token. The streaming agents re-decode their
    whole target prefix every chunk (reference online_text_decoder.py:317), so
    this turns the per-chunk prefill from O(ctx) weight passes into O(1) —
    the dominant cost of a 320 ms streaming chunk at long contexts.

    Same contract/invariants as monotonic_prefill: returns (last logits (B,V),
    features (B,T,D), last p_choose (B,L*H,Sp), cache with rows [0,T) written;
    rows >= n_tokens hold garbage that callers must overwrite before reading
    by resuming decode at exactly step = n_tokens)."""
    B, T = tokens.shape
    H = cfg.num_heads
    x = embedding_frontend(params["embed"], tokens, cfg.dec_cfg())
    cross_bias = padding_bias(enc_padding_mask)
    cbias = causal_mask(T)[None, None]                        # (1,1,T,T)
    last = jnp.clip(n_tokens - 1, 0, T - 1)

    # cross-attention uses the per-layer precomputed K/V from the cache —
    # threaded through the scan alongside the layer params
    def full_body(h, scanned):
        layer_p, ck, cv = scanned
        z = layer_norm(layer_p["self_attn_layer_norm"], h)
        ap = layer_p["self_attn"]
        q = attn_ops._split_heads(linear(ap["q_proj"], z), H)
        k = attn_ops._split_heads(linear(ap["k_proj"], z), H)
        v = attn_ops._split_heads(linear(ap["v_proj"], z), H)
        y = attn_ops._sdpa(q, k, v, cbias)
        h = h + linear(ap["output_proj"], attn_ops._merge_heads(y))

        z = layer_norm(layer_p["cross_attn_layer_norm"], h)
        z_last = jax.lax.dynamic_slice_in_dim(z, last, 1, axis=1)
        pc = p_choose(layer_p["p_choose"], z_last, cache.pooled_keys, cfg)
        cp = layer_p["cross_attn"]
        cq = attn_ops._split_heads(linear(cp["q_proj"], z), H)
        co = attn_ops._sdpa(cq, ck, cv, cross_bias)
        h = h + linear(cp["output_proj"], attn_ops._merge_heads(co))

        z = layer_norm(layer_p["ffn"]["layer_norm"], h)
        z = jax.nn.relu(linear(layer_p["ffn"]["inner_proj"], z))
        h = h + linear(layer_p["ffn"]["output_proj"], z)
        return h, (k.astype(cache.self_k.dtype), v.astype(cache.self_v.dtype),
                   pc[:, :, 0, :])

    out, (ks, vs, pcs) = jax.lax.scan(
        full_body, x, (params["layers"], cache.cross_k, cache.cross_v))
    out = layer_norm(params["layer_norm"], out)
    out_last = jax.lax.dynamic_slice_in_dim(out, last, 1, axis=1)
    logits = tied_projection(params["embed"], out_last)[:, 0]

    # (L, B, H, Sp) -> (B, L*H, Sp), matching monotonic_decode_step
    L, B2, Hh, Sp = pcs.shape
    pcs = pcs.transpose(1, 0, 2, 3).reshape(B, L * Hh, Sp)
    nk = jax.lax.dynamic_update_slice(cache.self_k, ks, (0, 0, 0, 0, 0))
    nv = jax.lax.dynamic_update_slice(cache.self_v, vs, (0, 0, 0, 0, 0))
    new_cache = MonotonicCache(nk, nv, cache.cross_k, cache.cross_v,
                               cache.pooled_keys)
    return logits, out, pcs, new_cache
