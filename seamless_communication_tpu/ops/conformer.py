"""Conformer encoder block, parameterized for both SeamlessM4T speech-encoder variants.

Block structure (reference fairseq2.cpp:733-757 ``StandardConformerEncoderLayer_forward``):
    x += 0.5 * ffn1(LN(x))
    x += self_attn(LN(x))            # XL rel-pos (v1) or Shaw clipped rel-pos (v2)
    x += conv_module(LN(x))          # pointwise(2x)+GLU -> depthwise -> norm -> swish -> pointwise
    x += 0.5 * ffn2(LN(x))
    x = LN(x)

Variant differences (reference models/conformer_shaw/builder.py:127-156):
    v1: depthwise conv SAME-padded, batch-norm (folded to scale/shift at load), XL attention
    v2: depthwise conv CAUSAL (left pad k-1), layer-norm, Shaw attention

The 24-layer stack runs under ``jax.lax.scan`` over stacked parameters.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.masks import apply_padding_mask, padding_bias
from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, glu, layer_norm, layer_norm_init, linear, linear_init, swish,
)


class ConformerConfig(NamedTuple):
    dim: int = 1024
    ffn_inner_dim: int = 4096
    num_heads: int = 16
    depthwise_kernel_size: int = 31
    num_layers: int = 24
    pos_type: str = "shaw"          # "shaw" (v2) | "xl" (v1) | "none"
    causal_depthwise_conv: bool = True   # v2: causal; v1: SAME
    conv_norm: str = "layer_norm"   # v2: layer_norm; v1: batch_norm
    shaw_max_left: int = 64
    shaw_max_right: int = 8


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _ffn_init(key, dim, inner, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "layer_norm": layer_norm_init(dim, dtype=dtype),
        "inner_proj": linear_init(k1, dim, inner, dtype=dtype),
        "output_proj": linear_init(k2, inner, dim, dtype=dtype),
    }


def conformer_layer_init(key: jax.Array, cfg: ConformerConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    if cfg.pos_type == "shaw":
        sa = attn_ops.shaw_attention_init(ks[0], cfg.dim, cfg.num_heads,
                                          max_left=cfg.shaw_max_left,
                                          max_right=cfg.shaw_max_right, dtype=dtype)
    elif cfg.pos_type == "xl":
        sa = attn_ops.xl_attention_init(ks[0], cfg.dim, cfg.num_heads, dtype=dtype)
    else:
        sa = attn_ops.mha_init(ks[0], cfg.dim, cfg.num_heads, dtype=dtype)
    conv = {
        "layer_norm": layer_norm_init(cfg.dim, dtype=dtype),
        "pointwise_conv1": linear_init(ks[1], cfg.dim, 2 * cfg.dim, bias=False, dtype=dtype),
        "depthwise_conv": conv1d_init(ks[2], cfg.dim, cfg.dim, cfg.depthwise_kernel_size,
                                      groups=cfg.dim, bias=False, dtype=dtype),
        # batch-norm (v1) is folded into an affine scale/shift at checkpoint-load time,
        # so both variants store {scale, bias} here ("norm").
        "norm": layer_norm_init(cfg.dim, dtype=dtype),
        "pointwise_conv2": linear_init(ks[3], cfg.dim, cfg.dim, bias=False, dtype=dtype),
    }
    return {
        "ffn1": _ffn_init(ks[4], cfg.dim, cfg.ffn_inner_dim, dtype),
        "self_attn_layer_norm": layer_norm_init(cfg.dim, dtype=dtype),
        "self_attn": sa,
        "conv": conv,
        "ffn2": _ffn_init(ks[5], cfg.dim, cfg.ffn_inner_dim, dtype),
        "layer_norm": layer_norm_init(cfg.dim, dtype=dtype),
    }


def conformer_stack_init(key: jax.Array, cfg: ConformerConfig, *, dtype=jnp.float32) -> dict:
    """Stacked layer params with leading layer axis (lax.scan-ready)."""
    keys = jax.random.split(key, cfg.num_layers)
    layers = [conformer_layer_init(k, cfg, dtype=dtype) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _ffn(params: dict, x: jax.Array) -> jax.Array:
    h = layer_norm(params["layer_norm"], x)
    h = swish(linear(params["inner_proj"], h))
    return linear(params["output_proj"], h)


def _conv_module(params: dict, x: jax.Array, cfg: ConformerConfig,
                 padding_mask: Optional[jax.Array]) -> jax.Array:
    h = layer_norm(params["layer_norm"], x)
    # zero padded steps so the depthwise conv cannot leak padding
    h = apply_padding_mask(h, padding_mask)
    h = linear(params["pointwise_conv1"], h)          # (B, T, 2D)
    h = glu(h, axis=-1)
    pad = "CAUSAL" if cfg.causal_depthwise_conv else "SAME"
    h = conv1d(params["depthwise_conv"], h, padding=pad, groups=cfg.dim)
    if cfg.conv_norm == "batch_norm":
        # v1: inference-mode batch norm folded to per-channel affine at load time
        h = h * params["norm"]["scale"].astype(h.dtype) + params["norm"]["bias"].astype(h.dtype)
    else:
        h = layer_norm(params["norm"], h)
    h = swish(h)
    return linear(params["pointwise_conv2"], h)


def conformer_layer(params: dict, x: jax.Array, cfg: ConformerConfig, *,
                    attn_bias: Optional[jax.Array],
                    padding_mask: Optional[jax.Array]) -> jax.Array:
    x = x + 0.5 * _ffn(params["ffn1"], x)
    h = layer_norm(params["self_attn_layer_norm"], x)
    if cfg.pos_type == "shaw":
        h = attn_ops.shaw_self_attention(params["self_attn"], h, cfg.num_heads,
                                         max_left=cfg.shaw_max_left,
                                         max_right=cfg.shaw_max_right, bias=attn_bias)
    elif cfg.pos_type == "xl":
        h = attn_ops.xl_self_attention(params["self_attn"], h, cfg.num_heads,
                                       bias=attn_bias)
    else:
        h = attn_ops.multi_head_attention(params["self_attn"], h, h, cfg.num_heads,
                                          bias=attn_bias)
    x = x + h
    x = x + _conv_module(params["conv"], x, cfg, padding_mask)
    x = x + 0.5 * _ffn(params["ffn2"], x)
    return layer_norm(params["layer_norm"], x)


def conformer_encoder(stacked_params: dict, x: jax.Array, cfg: ConformerConfig, *,
                      padding_mask: Optional[jax.Array] = None,
                      chunk_bias: Optional[jax.Array] = None) -> jax.Array:
    """Run the full conformer stack with lax.scan over stacked layer params.

    ``chunk_bias``: optional additive (Tq, Tk) bias implementing the v2 streaming
    chunked attention (HF _apply_chunk_attention semantics).
    """
    bias = padding_bias(padding_mask)
    if chunk_bias is not None:
        cb = chunk_bias[None, None]
        bias = cb if bias is None else bias + cb

    from seamless_communication_tpu.ops import remat
    from seamless_communication_tpu.parallel.pipeline import pipeline_or_none

    piped = pipeline_or_none(
        lambda h, tens, lp: conformer_layer(lp, h, cfg,
                                            attn_bias=tens.get("bias"),
                                            padding_mask=tens.get("mask")),
        stacked_params, x, {"bias": bias, "mask": padding_mask})
    if piped is not None:
        return piped

    def body(h, layer_params):
        return conformer_layer(layer_params, h, cfg, attn_bias=bias,
                               padding_mask=padding_mask), None

    out, _ = jax.lax.scan(remat.maybe_checkpoint(body), x, stacked_params)
    return out


def chunk_attention_bias(seq_len: int, chunk_size: int, left_chunk_num: int) -> jax.Array:
    """Additive (T, T) bias restricting attention to the current chunk plus
    ``left_chunk_num`` previous chunks (HF v2 ``_apply_chunk_attention``);
    used by the SeamlessStreaming speech encoder."""
    idx = jnp.arange(seq_len)
    chunk = idx // chunk_size
    start_chunk = jnp.maximum(chunk - left_chunk_num, 0) if left_chunk_num >= 0 else jnp.zeros_like(chunk)
    start = start_chunk * chunk_size
    end = (chunk + 1) * chunk_size
    j = idx[None, :]
    ok = (j >= start[:, None]) & (j < end[:, None])
    return jnp.where(ok, 0.0, -1e9).astype(jnp.float32)
