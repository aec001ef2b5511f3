"""Weight-only int8 quantization (the TPU-native counterpart of the reference's
ggml quantized dtypes, ggml/src/ggml-quants.c — Q8-style per-output-channel scales).

Single-stream beam decoding is HBM-bound on weight reads (~1 GB per step for the
dense_1b decoder stack); int8 weights halve the bytes and use the MXU's int8 path.

  quantize:   W (in, out) fp  ->  W_i8 int8, scale (out,) = max|W|/127 per column
  matmul:     y = (x_bf16 @ W_i8) * scale   (accumulate fp32)

``quantize_params`` rewrites selected linear weights in a param pytree in place of
{"weight": ...} with {"weight_i8": ..., "scale": ...}; ``ops.modules.linear``
dispatches on the key. Embeddings quantize per-row (lookup stays a gather; the tied
projection uses the same table transposed).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def quantize_weight(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(in, out) -> int8 weights + per-output-column fp32 scales."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale[None, :]), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_embedding(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(vocab, dim) -> int8 rows + per-row fp32 scales (row = token embedding;
    the tied projection reuses them as per-logit output scales)."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=1) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w32 / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def embedding_lookup_quantized(params: dict, ids: jax.Array, *,
                               scale_mult=None) -> jax.Array:
    e = params["embedding_i8"][ids].astype(jnp.float32)
    e = e * params["row_scale"][ids][..., None]
    if scale_mult is not None:
        e = e * scale_mult
    return e


def tied_projection_quantized(params: dict, x: jax.Array) -> jax.Array:
    """logits = (x @ Q^T) * row_scale — int8 operand halves the dominant
    vocab-table HBM read of each decode step."""
    q = params["embedding_i8"]
    y = jnp.matmul(x, q.T.astype(x.dtype), preferred_element_type=jnp.float32)
    return y * params["row_scale"][None, None, :]


def linear_quantized(params: dict, x: jax.Array, *, accum_dtype=jnp.float32
                     ) -> jax.Array:
    """y = (x @ W_i8) * scale (+ b). Inputs stay bf16/fp32; int8 weights are the
    memory- and MXU-efficient operand."""
    q = params["weight_i8"]
    y = jnp.matmul(x, q.astype(x.dtype), preferred_element_type=accum_dtype)
    y = y * params["scale"].astype(accum_dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.astype(x.dtype)


# matmul linears only (conv weights go through conv1d, which reads fp weights)
DEFAULT_QUANT_SUFFIXES = ("q_proj", "k_proj", "v_proj", "output_proj",
                          "inner_proj", "r_proj")


def quantize_params(params, *, include: Sequence[str] = DEFAULT_QUANT_SUFFIXES,
                    min_size: int = 1 << 16,
                    predicate: Optional[Callable] = None):
    """Rewrite large linear weights to int8 in a param pytree.

    ``predicate(path_list, leaf)`` overrides the default rule (parent-name suffix
    match + minimum element count). Layer-stacked weights (leading L axis) quantize
    with per-(layer, column) scales.
    """

    def default_pred(path, leaf):
        if not path or path[-1] != "weight":
            return False
        parent = path[-2] if len(path) >= 2 else ""
        return (parent in include and hasattr(leaf, "size")
                and leaf.size >= min_size and leaf.ndim >= 2)

    pred = predicate or default_pred
    # preserve aliasing: tied subtrees (e.g. the shared NLLB embedding between
    # text encoder/decoder) must stay one object, not duplicate int8 tables
    seen: dict = {}

    def walk(node, path):
        if isinstance(node, dict):
            if id(node) in seen:
                return seen[id(node)]
            out = {}
            seen[id(node)] = out
            for k, v in node.items():
                if (k == "embedding" and hasattr(v, "size")
                        and v.size >= min_size and v.ndim == 2):
                    q, s = quantize_embedding(v)
                    out["embedding_i8"] = q
                    out["row_scale"] = s
                elif k == "weight" and pred(path + [k], v):
                    w = jnp.asarray(v, jnp.float32)
                    if w.ndim == 2:
                        q, s = quantize_weight(w)
                    else:  # (L, in, out) scan-stacked
                        q, s = jax.vmap(quantize_weight)(w)
                    out["weight_i8"] = q
                    out["scale"] = s
                else:
                    out[k] = walk(v, path + [k])
            return out
        if isinstance(node, list):
            return [walk(v, path + [str(i)]) for i, v in enumerate(node)]
        return node

    return walk(params, [])


def quantization_report(params) -> dict:
    """Byte counts before/after for visibility."""
    total = quant = 0

    def walk(node):
        nonlocal total, quant
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "weight_i8":
                    quant += v.size
                    total += v.size
                elif hasattr(v, "size") and not isinstance(v, (dict, list)):
                    total += v.size * v.dtype.itemsize
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return {"quantized_weight_bytes": int(quant), "other_param_bytes": int(total - quant)}
