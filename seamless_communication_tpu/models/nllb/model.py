"""NLLB-style text encoder/decoder (dense_1b: 24+24 layers, 1024d, ffn 8192, vocab
256102/256206) — reference models/unity/builder.py:109-356 arch registry; transformer
math spec fairseq2.cpp:917-1095.

The decoder weights are shared between the UnitY text decoder and the final (tied)
projection. The expressive variant swaps ReLU for GELU (NllbWithGELUBuilder,
builder.py:581).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.masks import lengths_to_padding_mask
from seamless_communication_tpu.ops.modules import embedding_init
from seamless_communication_tpu.ops.transformer import (
    DecoderCache,
    TransformerConfig,
    decoder_cache_init,
    embedding_frontend,
    tied_projection,
    transformer_decoder,
    transformer_decoder_step,
    transformer_encoder,
    transformer_stack_init,
)


class NllbConfig(NamedTuple):
    dim: int = 1024
    num_encoder_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 16
    ffn_inner_dim: int = 8192
    vocab_size: int = 256102
    pad_idx: int = 0
    eos_idx: int = 3
    unk_idx: int = 1
    max_seq_len: int = 4096
    activation: str = "relu"

    def enc_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.dim, self.num_encoder_layers, self.num_heads,
                                 self.ffn_inner_dim, self.activation, self.vocab_size,
                                 self.pad_idx, self.max_seq_len, False)

    def dec_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.dim, self.num_decoder_layers, self.num_heads,
                                 self.ffn_inner_dim, self.activation, self.vocab_size,
                                 self.pad_idx, self.max_seq_len, True)


def text_encoder_init(key: jax.Array, cfg: NllbConfig, *, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "embed": embedding_init(k1, cfg.vocab_size, cfg.dim, dtype=dtype),
        "stack": transformer_stack_init(k2, cfg.enc_cfg(), dtype=dtype),
    }


def text_decoder_init(key: jax.Array, cfg: NllbConfig, *, dtype=jnp.float32,
                      tie_embed: Optional[dict] = None) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "embed": tie_embed if tie_embed is not None
        else embedding_init(k1, cfg.vocab_size, cfg.dim, dtype=dtype),
        "stack": transformer_stack_init(k2, cfg.dec_cfg(), dtype=dtype),
    }


def text_encoder_forward(params: dict, ids: jax.Array, lengths: jax.Array,
                         cfg: NllbConfig) -> tuple[jax.Array, jax.Array]:
    mask = lengths_to_padding_mask(lengths, ids.shape[1])
    x = embedding_frontend(params["embed"], ids, cfg.enc_cfg(), padding_mask=mask)
    return transformer_encoder(params["stack"], x, cfg.enc_cfg(), padding_mask=mask), mask


def text_decoder_forward(params: dict, ids: jax.Array, enc_out: jax.Array,
                         cfg: NllbConfig, *,
                         enc_padding_mask: Optional[jax.Array] = None,
                         self_padding_mask: Optional[jax.Array] = None) -> jax.Array:
    """Full-sequence decode -> (B, T, D) features (pre-projection)."""
    x = embedding_frontend(params["embed"], ids, cfg.dec_cfg(),
                           padding_mask=self_padding_mask)
    return transformer_decoder(params["stack"], x, cfg.dec_cfg(), enc_out=enc_out,
                               enc_padding_mask=enc_padding_mask,
                               self_padding_mask=self_padding_mask)


def text_decoder_step(params: dict, tok_t: jax.Array, cache: DecoderCache,
                      step: jax.Array, cfg: NllbConfig, *,
                      enc_padding_mask: Optional[jax.Array] = None,
                      beam_src: Optional[jax.Array] = None
                      ) -> tuple[jax.Array, DecoderCache]:
    """One KV-cached decode step -> ((B, V) fp32 logits, cache)."""
    x = embedding_frontend(params["embed"], tok_t, cfg.dec_cfg(), start_step=step)
    h, cache = transformer_decoder_step(params["stack"], x, cache, step, cfg.dec_cfg(),
                                        enc_padding_mask=enc_padding_mask,
                                        beam_src=beam_src)
    return tied_projection(params["embed"], h)[:, 0], cache


def text_decoder_step_topk(params: dict, tok_t: jax.Array, cache: DecoderCache,
                           step: jax.Array, cfg: NllbConfig, k: int, *,
                           enc_padding_mask: Optional[jax.Array] = None,
                           beam_src: Optional[jax.Array] = None):
    """One KV-cached decode step in CANDIDATE form -> ((B, k) top log-probs,
    (B, k) i32 vocab ids, cache). With an int8-quantized tied embedding the
    vocab projection, logsumexp, and top-k fuse into one streaming Pallas pass
    (ops/kernels/vocab_topk.py) — the (B, V) logits never materialize."""
    from seamless_communication_tpu.ops.kernels.vocab_topk import (
        _reference as _vocab_ref, int8_vocab_topk_v2,
    )

    x = embedding_frontend(params["embed"], tok_t, cfg.dec_cfg(), start_step=step)
    h, cache = transformer_decoder_step(params["stack"], x, cache, step,
                                        cfg.dec_cfg(),
                                        enc_padding_mask=enc_padding_mask,
                                        beam_src=beam_src)
    h1 = h[:, 0]
    embed = params["embed"]
    if "embedding_i8" in embed:
        vals, idx, logz = int8_vocab_topk_v2(h1, embed["embedding_i8"],
                                             embed["row_scale"], k)
    else:
        w = embed["embedding"]
        vals, idx, logz = _vocab_ref(h1, w, jnp.ones((w.shape[0],), jnp.float32),
                                     k)
    return vals - logz[:, None], idx, cache


def text_decoder_cache(params: dict, cfg: NllbConfig, enc_out: jax.Array,
                       max_len: int, *, kv_int8: bool = False,
                       per_layer: bool = True,
                       kv_bits: int = 8) -> DecoderCache:
    # per-layer caches are the TPU decode fast path (ops/transformer.py
    # decoder_cache_init docstring)
    return decoder_cache_init(params["stack"], cfg.dec_cfg(), enc_out, max_len,
                              kv_int8=kv_int8, per_layer=per_layer,
                              kv_bits=kv_bits)
