"""Primitive neural-net layers as pure functions over parameter pytrees.

These replace the fairseq2 ``Linear`` / ``LayerNorm`` / ``StandardEmbedding`` / ``Conv1d``
modules whose semantics are specified by the reference's C++ re-implementation
(``ggml/examples/unity/fairseq2.cpp:251-330``).

Conventions:
- activations are ``(batch, time, dim)``;
- linear weights are stored ``(in_dim, out_dim)`` (transposed from torch's ``(out, in)``
  at checkpoint-conversion time) so the forward is a single MXU matmul;
- matmuls accumulate in fp32 via ``preferred_element_type`` regardless of param dtype.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def _uniform(key: jax.Array, shape, scale: float, dtype) -> jax.Array:
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale, dtype=jnp.float32).astype(dtype)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key: jax.Array, in_dim: int, out_dim: int, *, bias: bool = True,
                dtype=jnp.float32) -> dict:
    """Kaiming-uniform init matching torch ``nn.Linear`` defaults."""
    wkey, bkey = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    params = {"weight": _uniform(wkey, (in_dim, out_dim), scale, dtype)}
    if bias:
        params["bias"] = _uniform(bkey, (out_dim,), scale, dtype)
    return params


def linear(params: dict, x: jax.Array, *, accum_dtype=jnp.float32) -> jax.Array:
    """y = x @ W (+ b). Accumulates in fp32 on the MXU, returns x.dtype.
    Dispatches to the int8 weight-only path when the params were rewritten by
    ops.quantization.quantize_params."""
    if "weight_i8" in params:
        from seamless_communication_tpu.ops.quantization import linear_quantized
        return linear_quantized(params, x, accum_dtype=accum_dtype)
    if "weight_i4" in params:
        from seamless_communication_tpu.ops.quantization import (
            linear_quantized_int4,
        )
        return linear_quantized_int4(params, x, accum_dtype=accum_dtype)
    w = params["weight"]
    y = jnp.matmul(x, w.astype(x.dtype), preferred_element_type=accum_dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------

def layer_norm_init(dim: int, *, elementwise_affine: bool = True, dtype=jnp.float32) -> dict:
    if not elementwise_affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def layer_norm(params: dict, x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last dim; statistics computed in fp32
    (fairseq2.cpp LayerNorm_forward, reference fairseq2.cpp:251-266)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if params:
        y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def embedding_init(key: jax.Array, vocab_size: int, dim: int, *, dtype=jnp.float32) -> dict:
    emb = jax.random.normal(key, (vocab_size, dim), jnp.float32) * (dim ** -0.5)
    return {"embedding": emb.astype(dtype)}


def embedding(params: dict, ids: jax.Array, *, scale: Optional[float] = None) -> jax.Array:
    """Token-id lookup; ``scale`` is the sqrt(dim) multiplier fairseq2's
    ``StandardEmbedding`` applies inside transformer frontends. Dispatches to the
    int8 row-quantized table when present."""
    if "embedding_i8" in params:
        from seamless_communication_tpu.ops.quantization import (
            embedding_lookup_quantized,
        )
        return embedding_lookup_quantized(params, ids, scale_mult=scale)
    if "embedding_i4" in params:
        from seamless_communication_tpu.ops.quantization import (
            embedding_lookup_quantized_int4,
        )
        return embedding_lookup_quantized_int4(params, ids, scale_mult=scale)
    e = params["embedding"][ids]
    if scale is not None:
        e = e * jnp.asarray(scale, e.dtype)
    return e


# ---------------------------------------------------------------------------
# Conv1d (NWC layout)
# ---------------------------------------------------------------------------

def conv1d_init(key: jax.Array, in_ch: int, out_ch: int, kernel_size: int, *,
                groups: int = 1, bias: bool = True, dtype=jnp.float32) -> dict:
    wkey, bkey = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    # layout (kernel, in_ch // groups, out_ch) == jax "WIO"
    params = {"weight": _uniform(wkey, (kernel_size, in_ch // groups, out_ch), scale, dtype)}
    if bias:
        params["bias"] = _uniform(bkey, (out_ch,), scale, dtype)
    return params


def conv1d(params: dict, x: jax.Array, *, stride: int = 1, padding="SAME",
           groups: int = 1, dilation: int = 1) -> jax.Array:
    """1-D convolution on (batch, time, channels). ``padding`` may be "SAME", "VALID",
    "CAUSAL", or an explicit (lo, hi) tuple."""
    w = params["weight"].astype(x.dtype)
    k = w.shape[0]
    if padding == "CAUSAL":
        pad = [((k - 1) * dilation, 0)]
    elif isinstance(padding, tuple):
        pad = [padding]
    else:
        pad = padding
    # no preferred_element_type: TPU convs accumulate fp32 in the MXU anyway,
    # and a widened output dtype breaks the conv VJP under bf16 params
    # (transposed-conv cotangent fp32 vs bf16 weights)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def conv_transpose1d_init(key: jax.Array, in_ch: int, out_ch: int, kernel_size: int, *,
                          bias: bool = True, dtype=jnp.float32) -> dict:
    wkey, bkey = jax.random.split(key)
    fan_in = in_ch * kernel_size
    scale = 1.0 / math.sqrt(fan_in)
    params = {"weight": _uniform(wkey, (kernel_size, in_ch, out_ch), scale, dtype)}
    if bias:
        params["bias"] = _uniform(bkey, (out_ch,), scale, dtype)
    return params


def conv_transpose1d(params: dict, x: jax.Array, *, stride: int,
                     padding: int = 0, output_padding: int = 0) -> jax.Array:
    """Transposed 1-D conv on (batch, time, channels) matching torch
    ``ConvTranspose1d(stride=s, padding=p, output_padding=op)``:
    out_len = (in_len-1)*s - 2p + k + op (op extends the right edge).
    Used by the HiFi-GAN upsampler stacks (reference hifigan.py:150-160;
    PRETSSEL's add_ups_out_pad variant, generator/vocoder.py:407-421)."""
    w = params["weight"].astype(x.dtype)
    k = w.shape[0]
    # torch conv_transpose == dilated conv with spatially-flipped kernel
    # padding arithmetic: pad_lo = pad_hi = k - 1 - padding (+op on the right)
    y = jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0),
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activations / gating
# ---------------------------------------------------------------------------

def glu(x: jax.Array, axis: int = -1) -> jax.Array:
    """Gated linear unit: split in half along ``axis``; a * sigmoid(b)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)
