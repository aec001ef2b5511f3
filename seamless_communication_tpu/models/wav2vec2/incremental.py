"""Exact incremental (chunk-causal) streaming speech encoder.

The streaming card's conformer (cards/seamless_streaming_unity.yaml; arch
``streaming``) uses chunked attention with FULL left context
(chunk_size=8, left_chunk_num=-1) and a CAUSAL depthwise conv, so every
conformer output inside a completed chunk is FINAL: it can never change as more
audio arrives. The reference (and our offline agent,
streaming/agents/offline_w2v_bert_encoder.py) still re-encodes the entire fbank
prefix every 320 ms chunk — O(T^2) total conformer compute. This module keeps
per-layer K/V caches + causal-conv tails and encodes ONLY the new frames,
reproducing the offline chunked output exactly (tests/unit/test_incremental_encoder.py)
at O(T) total conformer compute. Only the tiny adaptor stage (bidirectional
attention over the stride-8-downsampled sequence) is recomputed per call.

Because the state carries a dynamic frame counter, ONE compiled program serves
every prefix length — no length bucketing, no mid-stream recompiles.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.wav2vec2.encoder import (
    SpeechEncoderConfig, _adaptor_layer, stack_fbank_frames,
)
from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.conformer import ConformerConfig, _ffn
from seamless_communication_tpu.ops.masks import (
    NEG_INF, apply_padding_mask, lengths_to_padding_mask,
)
from seamless_communication_tpu.ops.modules import (
    conv1d, glu, layer_norm, linear, swish,
)


class SpeechEncoderStreamState(NamedTuple):
    k: jax.Array          # (L, B, H, T_max, Dh) conformer self-attn keys
    v: jax.Array          # (L, B, H, T_max, Dh)
    conv_tail: jax.Array  # (L, B, K-1, D) last GLU outputs feeding the causal conv
    buf: jax.Array        # (B, T_max, D) finalized post-intermediate-ffn frames
    n: jax.Array          # () int32 stacked frames encoded so far


def speech_encoder_stream_init(cfg: SpeechEncoderConfig, *, batch: int = 1,
                               max_frames: int = 1024, dtype=jnp.float32
                               ) -> SpeechEncoderStreamState:
    """``max_frames`` counts STACKED frames (fbank frames / fbank_stride)."""
    c = cfg.conformer
    H, Dh = c.num_heads, c.dim // c.num_heads
    L, K = c.num_layers, c.depthwise_kernel_size
    return SpeechEncoderStreamState(
        k=jnp.zeros((L, batch, H, max_frames, Dh), dtype),
        v=jnp.zeros((L, batch, H, max_frames, Dh), dtype),
        conv_tail=jnp.zeros((L, batch, K - 1, c.dim), dtype),
        buf=jnp.zeros((batch, max_frames, cfg.model_dim), dtype),
        n=jnp.asarray(0, jnp.int32))


def _shaw_attention_step(p: dict, h: jax.Array, k_cache: jax.Array,
                         v_cache: jax.Array, t0: jax.Array,
                         cfg: ConformerConfig) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Queries = N new positions at global offset t0; keys = all cached positions.
    Applies the chunked-attention rule (attend to j < (chunk(i)+1)*chunk_size,
    full left context) and Shaw clipped relative-position logits."""
    B, N, _ = h.shape
    Hn = cfg.num_heads
    q = attn_ops._split_heads(linear(p["q_proj"], h), Hn)       # (B,H,N,Dh)
    k_new = attn_ops._split_heads(linear(p["k_proj"], h), Hn)
    v_new = attn_ops._split_heads(linear(p["v_proj"], h), Hn)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new.astype(k_cache.dtype),
                                           (0, 0, t0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new.astype(v_cache.dtype),
                                           (0, 0, t0, 0))
    T_max = k_cache.shape[2]
    dh = q.shape[-1]
    key_pos = jnp.arange(T_max)
    q_pos = t0 + jnp.arange(N)

    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache.astype(q.dtype),
                        preferred_element_type=jnp.float32)
    rel = p["rel_k_embed"]["embedding"].astype(q.dtype)          # (P, Dh)
    dist = jnp.clip(key_pos[None, :] - q_pos[:, None],
                    -cfg.shaw_max_left, cfg.shaw_max_right)
    idx = dist + cfg.shaw_max_left                               # (N, T_max)
    rel_full = jnp.einsum("bhqd,pd->bhqp", q, rel,
                          preferred_element_type=jnp.float32)    # (B,H,N,P)
    # one-hot select instead of gather (bit-exact, MXU-friendly — see
    # ops/attention.py shaw_self_attention)
    P = rel.shape[0]
    onehot = (idx[:, :, None] == jnp.arange(P)[None, None, :]
              ).astype(jnp.float32)                              # (N, T_max, P)
    rel_logits = jnp.einsum("bhqp,qjp->bhqj", rel_full, onehot,
                            preferred_element_type=jnp.float32)
    logits = (logits + rel_logits) / math.sqrt(dh)
    return logits, k_cache, v_cache, v_new


def _conformer_layer_step(p: dict, x: jax.Array, k_cache: jax.Array,
                          v_cache: jax.Array, conv_tail: jax.Array,
                          t0: jax.Array, n_valid: jax.Array,
                          cfg: ConformerConfig, chunk_size: int
                          ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    B, N, D = x.shape
    x = x + 0.5 * _ffn(p["ffn1"], x)

    h = layer_norm(p["self_attn_layer_norm"], x)
    logits, k_cache, v_cache, _ = _shaw_attention_step(
        p["self_attn"], h, k_cache, v_cache, t0, cfg)
    T_max = k_cache.shape[2]
    key_pos = jnp.arange(T_max)
    q_pos = t0 + jnp.arange(N)
    allowed = (key_pos[None, :] < ((q_pos[:, None] // chunk_size) + 1) * chunk_size
               # a partial FINAL block: within-chunk attention must not see the
               # zero-padded frames past the true end of the stream
               ) & (key_pos[None, :] < t0 + n_valid)
    logits = jnp.where(allowed[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(x.dtype),
                     v_cache.astype(x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    x = x + linear(p["self_attn"]["output_proj"], attn_ops._merge_heads(out))

    # conv module: causal depthwise over [tail (K-1), new GLU outputs]
    hc = layer_norm(p["conv"]["layer_norm"], x)
    hc = glu(linear(p["conv"]["pointwise_conv1"], hc), axis=-1)  # (B, N, D)
    full = jnp.concatenate([conv_tail.astype(hc.dtype), hc], axis=1)
    new_tail = full[:, -conv_tail.shape[1]:, :]
    hv = conv1d(p["conv"]["depthwise_conv"], full, padding=(0, 0), groups=cfg.dim)
    hv = layer_norm(p["conv"]["norm"], hv)
    hv = swish(hv)
    x = x + linear(p["conv"]["pointwise_conv2"], hv)

    x = x + 0.5 * _ffn(p["ffn2"], x)
    x = layer_norm(p["layer_norm"], x)
    return x, k_cache, v_cache, new_tail


def speech_encoder_stream_step(params: dict, state: SpeechEncoderStreamState,
                               fbank_new: jax.Array, cfg: SpeechEncoderConfig,
                               *, n_valid: Optional[jax.Array] = None
                               ) -> SpeechEncoderStreamState:
    """Encode NEW fbank frames (B, T_new, 80); T_new/fbank_stride must be a
    multiple of the chunk size (the agent buffers to chunk boundaries). Appends
    finalized frames to the state buffer.

    ``n_valid`` (STACKED frames, <= T_new // fbank_stride) marks a partial
    FINAL block: the tail of ``fbank_new`` is zero padding that must not be
    attended. Only valid for the last step of a stream — a later step would
    read a conv tail contaminated by the padded rows."""
    if cfg.conformer.pos_type != "shaw":
        raise NotImplementedError("incremental encoder supports the v2 (shaw) "
                                  "conformer used by the streaming cards")
    B, T_new, _ = fbank_new.shape
    x, _ = stack_fbank_frames(fbank_new, jnp.full((B,), T_new, jnp.int32),
                              stride=cfg.fbank_stride)
    if n_valid is None:
        n_valid = jnp.asarray(x.shape[1], jnp.int32)
    x = layer_norm(params["feature_projection"]["layer_norm"], x)
    x = linear(params["feature_projection"]["projection"], x)

    chunk = cfg.chunk_size or 1

    def body(carry, scanned):
        xc = carry
        layer_p, kc, vc, tail = scanned
        xc, kc, vc, tail = _conformer_layer_step(
            layer_p, xc, kc, vc, tail, state.n, n_valid, cfg.conformer, chunk)
        return xc, (kc, vc, tail)

    x, (new_k, new_v, new_tail) = jax.lax.scan(
        body, x, (params["encoder"], state.k, state.v, state.conv_tail))

    h = jax.nn.relu(linear(params["intermediate_ffn"]["inner_proj"], x))
    x = x + 0.5 * linear(params["intermediate_ffn"]["output_proj"], h)

    buf = jax.lax.dynamic_update_slice(state.buf, x.astype(state.buf.dtype),
                                       (0, state.n, 0))
    return SpeechEncoderStreamState(new_k, new_v, new_tail, buf,
                                    state.n + n_valid)


def speech_encoder_stream_output(params: dict, state: SpeechEncoderStreamState,
                                 cfg: SpeechEncoderConfig
                                 ) -> tuple[jax.Array, jax.Array]:
    """Adaptor + final LN over the finalized conformer buffer -> the same
    (enc_out, enc_lens) as speech_encoder_forward on the full prefix. The
    adaptor attends bidirectionally over the stride-8 sequence, so it is
    recomputed per call — it is ~1/(8*num_layers) of the conformer's work."""
    B = state.buf.shape[0]
    x = state.buf
    lens = jnp.full((B,), state.n, jnp.int32)
    for layer_p in params["adaptor"]:
        x = apply_padding_mask(x, lengths_to_padding_mask(lens, x.shape[1]))
        x, lens = _adaptor_layer(layer_p, x, lens, cfg)
    x = layer_norm(params["inner_layer_norm"], x)
    x = apply_padding_mask(x, lengths_to_padding_mask(lens, x.shape[1]))
    return x, lens
