"""W2v-BERT speech encoder + length adaptor, TPU-native.

Covers the reference's wav2vec2 fbank frontend (stride-2 stacking 80->160 mel +
post-extract LN + projection, fairseq2.cpp:765-767), the 24-layer Conformer stack
(models/conformer_shaw/builder.py for v2; w2vbert rel-pos for v1), the
``seqs + 0.5*expand_contract(seqs)`` intermediate FFN, and the UnitY encoder adaptor
(models/unity/adaptor_block.py:31-438: strided GLU convs on both the attention input
and the residual, 8x time downsampling, recomputed padding mask
floor((len + 2p - k)/s) + 1).

Conventions checkpoint-validated against HF SeamlessM4T(v2)SpeechEncoder.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.conformer import (
    ConformerConfig, chunk_attention_bias, conformer_encoder, conformer_stack_init,
)
from seamless_communication_tpu.ops.masks import (
    apply_padding_mask, lengths_to_padding_mask, padding_bias,
)
from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, glu, layer_norm, layer_norm_init, linear, linear_init,
)


class SpeechEncoderConfig(NamedTuple):
    model_dim: int = 1024
    feature_dim: int = 160            # stacked fbank (80 x fbank_stride)
    fbank_stride: int = 2
    conformer: ConformerConfig = ConformerConfig()
    adaptor_layers: int = 1
    adaptor_kernel_size: int = 8
    adaptor_stride: int = 8
    num_adaptor_heads: int = 16
    ffn_inner_dim: int = 4096
    # v2 streaming variant: chunked attention (cards seamless_streaming_unity)
    chunk_size: Optional[int] = None
    left_chunk_num: int = -1


def stack_fbank_frames(fbank: jax.Array, frame_lens: jax.Array, stride: int = 2
                       ) -> tuple[jax.Array, jax.Array]:
    """(B, T, 80) -> (B, T//stride, 80*stride) frame stacking (w2v2 fbank frontend)."""
    B, T, F = fbank.shape
    T2 = T // stride
    out = fbank[:, :T2 * stride].reshape(B, T2, F * stride)
    return out, frame_lens // stride


def adaptor_out_length(length: jax.Array, k: int, s: int) -> jax.Array:
    """floor((len + 2*(k//2) - k) / s) + 1 (reference adaptor_block.py:426-438 with
    HF's padding = stride // 2... both resolve to k//2 here since k == s)."""
    pad = k // 2
    return (length + 2 * pad - k) // s + 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _adaptor_layer_init(key, cfg: SpeechEncoderConfig, dtype):
    ks = jax.random.split(key, 5)
    d = cfg.model_dim
    return {
        "residual_layer_norm": layer_norm_init(d, dtype=dtype),
        "residual_conv": conv1d_init(ks[0], d, 2 * d, cfg.adaptor_kernel_size, dtype=dtype),
        "self_attn_layer_norm": layer_norm_init(d, dtype=dtype),
        "self_attn_conv": conv1d_init(ks[1], d, 2 * d, cfg.adaptor_kernel_size, dtype=dtype),
        "self_attn": attn_ops.mha_init(ks[2], d, cfg.num_adaptor_heads, dtype=dtype),
        "ffn_layer_norm": layer_norm_init(d, dtype=dtype),
        "ffn": {
            "inner_proj": linear_init(ks[3], d, cfg.ffn_inner_dim, dtype=dtype),
            "output_proj": linear_init(ks[4], cfg.ffn_inner_dim, d, dtype=dtype),
        },
    }


def speech_encoder_init(key: jax.Array, cfg: SpeechEncoderConfig, *,
                        dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4 + cfg.adaptor_layers)
    params = {
        "feature_projection": {
            "layer_norm": layer_norm_init(cfg.feature_dim, dtype=dtype),
            "projection": linear_init(ks[0], cfg.feature_dim, cfg.model_dim, dtype=dtype),
        },
        "encoder": conformer_stack_init(ks[1], cfg.conformer, dtype=dtype),
        "intermediate_ffn": {
            "inner_proj": linear_init(ks[2], cfg.model_dim, cfg.ffn_inner_dim, dtype=dtype),
            "output_proj": linear_init(ks[3], cfg.ffn_inner_dim, cfg.model_dim, dtype=dtype),
        },
        "inner_layer_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
        "adaptor": [ _adaptor_layer_init(ks[4 + i], cfg, dtype)
                     for i in range(cfg.adaptor_layers) ],
    }
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _adaptor_layer(p: dict, x: jax.Array, lengths: jax.Array,
                   cfg: SpeechEncoderConfig) -> tuple[jax.Array, jax.Array]:
    k, s = cfg.adaptor_kernel_size, cfg.adaptor_stride
    pad = (s // 2, s // 2)
    residual = layer_norm(p["residual_layer_norm"], x)
    residual = glu(conv1d(p["residual_conv"], residual, stride=s, padding=pad), axis=-1)

    h = layer_norm(p["self_attn_layer_norm"], x)
    h = glu(conv1d(p["self_attn_conv"], h, stride=s, padding=pad), axis=-1)

    new_len = adaptor_out_length(lengths, k, s)
    mask = lengths_to_padding_mask(new_len, h.shape[1])
    h = attn_ops.multi_head_attention(p["self_attn"], h, h, cfg.num_adaptor_heads,
                                      bias=padding_bias(mask))
    x = h + residual
    h = layer_norm(p["ffn_layer_norm"], x)
    h = jax.nn.relu(linear(p["ffn"]["inner_proj"], h))
    x = x + linear(p["ffn"]["output_proj"], h)
    return x, new_len


def conformer_shaw_standalone_forward(params: dict, fbank: jax.Array,
                                      frame_lens: jax.Array,
                                      cfg: Optional["SpeechEncoderConfig"] = None
                                      ) -> tuple[jax.Array, jax.Array]:
    """Standalone pretrained conformer-shaw encoder: frontend (stack x2 ->
    LN -> proj) + conformer stack ONLY — no UnitY intermediate-ffn/adaptor
    (reference Wav2Vec2Model.encoder_frontend + .encoder as exercised by
    tests/integration/models/test_conformer_shaw.py:34-37). ``params`` is the
    tree from checkpoint.convert_fairseq2.conformer_shaw_tree_from_pt."""
    cfg = cfg or SpeechEncoderConfig()
    x, lens = stack_fbank_frames(fbank, frame_lens, stride=cfg.fbank_stride)
    x = layer_norm(params["feature_projection"]["layer_norm"], x)
    x = linear(params["feature_projection"]["projection"], x)
    mask = lengths_to_padding_mask(lens, x.shape[1])
    x = conformer_encoder(params["encoder"], x, cfg.conformer, padding_mask=mask)
    return x, lens


def speech_encoder_forward(params: dict, fbank: jax.Array, frame_lens: jax.Array,
                           cfg: SpeechEncoderConfig
                           ) -> tuple[jax.Array, jax.Array]:
    """(B, T, 80) fbank + (B,) frame counts -> (encoder output (B, T', D), (B,) T'_lens).

    Full path: stack x2 -> LN+proj -> conformer -> +0.5*ffn -> adaptor(s) -> LN.
    """
    x, lens = stack_fbank_frames(fbank, frame_lens, stride=cfg.fbank_stride)
    x = layer_norm(params["feature_projection"]["layer_norm"], x)
    x = linear(params["feature_projection"]["projection"], x)

    mask = lengths_to_padding_mask(lens, x.shape[1])
    chunk_bias = None
    if cfg.chunk_size is not None:
        chunk_bias = chunk_attention_bias(x.shape[1], cfg.chunk_size, cfg.left_chunk_num)
    x = conformer_encoder(params["encoder"], x, cfg.conformer, padding_mask=mask,
                          chunk_bias=chunk_bias)

    h = jax.nn.relu(linear(params["intermediate_ffn"]["inner_proj"], x))
    x = x + 0.5 * linear(params["intermediate_ffn"]["output_proj"], h)

    for layer_p in params["adaptor"]:
        x = apply_padding_mask(x, lengths_to_padding_mask(lens, x.shape[1]))
        x, lens = _adaptor_layer(layer_p, x, lens, cfg)

    x = layer_norm(params["inner_layer_norm"], x)
    x = apply_padding_mask(x, lengths_to_padding_mask(lens, x.shape[1]))
    return x, lens
