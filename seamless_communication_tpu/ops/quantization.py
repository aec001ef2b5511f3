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

from functools import partial
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


# ---------------------------------------------------------------------------
# int4 (group-wise) weight-only quantization
# ---------------------------------------------------------------------------
#
# Single-stream decode is HBM-bound on weight reads (docs/performance.md);
# int4 halves the int8 path's bytes again. Per-output-column absmax over the
# whole input dim is too coarse at 4 bits, so scales are per (input-group,
# output-column) with groups of ``INT4_GROUP`` input rows — the standard
# weight-only PTQ layout (GPTQ/AWQ-style absmax grouping). XLA TPU stores
# int4 packed (2/byte) in HBM and fuses the upconvert into the matmul
# operand, exactly like the int8 path. Lossier than int8 (~1–2% rms per
# matmul at group 128 vs ~0.3%): opt-in, never the default.

INT4_GROUP = 128


def _int4_group(in_dim: int, group: int) -> int:
    """Largest usable group size: ``group`` when it divides in_dim, else the
    whole input dim (one group — per-column scales, still 4-bit)."""
    return group if in_dim % group == 0 else in_dim


def quantize_weight_int4(w: jax.Array, *, group: int = INT4_GROUP
                         ) -> tuple[jax.Array, jax.Array]:
    """(in, out) -> int4 weights + (in/group, out) fp32 group scales.
    Symmetric absmax per (group, column); -8 left unused (±7 range)."""
    w32 = jnp.asarray(w, jnp.float32)
    in_dim, out_dim = w32.shape
    g = _int4_group(in_dim, group)
    wg = w32.reshape(in_dim // g, g, out_dim)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=1) / 7.0, 1e-8)   # (G, out)
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    return q.reshape(in_dim, out_dim).astype(jnp.int4), scale


def linear_quantized_int4(params: dict, x: jax.Array, *,
                          accum_dtype=jnp.float32) -> jax.Array:
    """y = Σ_g (x_g @ W4_g) * scale[g] (+ b). The per-group matmuls batch on
    the MXU (``...gi,gio->...go``); the int4 operand is upconverted in the
    fused matmul read, so HBM traffic is the packed 4-bit table."""
    q = params["weight_i4"]
    s = params["scale4"]                                    # (G, out)
    in_dim, out_dim = q.shape
    G = s.shape[0]
    g = in_dim // G
    lead = x.shape[:-1]
    xg = x.reshape(*lead, G, g)
    y = jnp.einsum("...gi,gio->...go", xg,
                   q.reshape(G, g, out_dim).astype(x.dtype),
                   preferred_element_type=accum_dtype)
    y = jnp.sum(y * s.astype(accum_dtype), axis=-2)
    b = params.get("bias")
    if b is not None:
        y = y + b.astype(accum_dtype)
    return y.astype(x.dtype)


def quantize_embedding_int4(w: jax.Array, *, group: int = INT4_GROUP
                            ) -> tuple[jax.Array, jax.Array]:
    """(vocab, dim) -> int4 rows + (vocab, dim/group) fp32 scales (grouped
    along the embedding dim; the tied projection reuses them per logit)."""
    w32 = jnp.asarray(w, jnp.float32)
    V, D = w32.shape
    g = _int4_group(D, group)
    wg = w32.reshape(V, D // g, g)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=2) / 7.0, 1e-8)   # (V, G)
    q = jnp.clip(jnp.round(wg / scale[..., None]), -7, 7)
    return q.reshape(V, D).astype(jnp.int4), scale


def embedding_lookup_quantized_int4(params: dict, ids: jax.Array, *,
                                    scale_mult=None) -> jax.Array:
    q = params["embedding_i4"]
    s = params["row_scale4"]                               # (V, G)
    V, D = q.shape
    G = s.shape[1]
    e = q[ids].astype(jnp.float32).reshape(*ids.shape, G, D // G)
    e = (e * s[ids][..., None]).reshape(*ids.shape, D)
    if scale_mult is not None:
        e = e * scale_mult
    return e


def tied_projection_quantized_int4(params: dict, x: jax.Array) -> jax.Array:
    """logits[..., v] = Σ_g (x_g · Q4[v, g]) * row_scale4[v, g].

    Accumulates group-by-group so the (…, G, V) intermediate never
    materializes — each group is one (…, g) x (g, V) matmul against a slice
    of the packed table, scaled per logit and added into the fp32
    accumulator. One pass over the 4-bit table total."""
    q = params["embedding_i4"]
    s = params["row_scale4"]                               # (V, G)
    V, D = q.shape
    G = s.shape[1]
    g = D // G
    out = None
    for i in range(G):
        qi = q[:, i * g:(i + 1) * g]                       # (V, g)
        yi = jnp.matmul(x[..., i * g:(i + 1) * g], qi.T.astype(x.dtype),
                        preferred_element_type=jnp.float32)
        yi = yi * s[:, i]
        out = yi if out is None else out + yi
    return out


# matmul linears only (conv weights go through conv1d, which reads fp
# weights). NOT r_proj: the XL factorized rel-bias consumes the raw weight
# matrix directly (ops/attention.py _xl_rel_bias reads
# params["r_proj"]["weight"] for its sinusoid-table matmuls) — quantizing it
# breaks that read, and it is a per-sequence (not per-decode-step) cost.
DEFAULT_QUANT_SUFFIXES = ("q_proj", "k_proj", "v_proj", "output_proj",
                          "inner_proj")


def quantize_params(params, *, include: Sequence[str] = DEFAULT_QUANT_SUFFIXES,
                    min_size: int = 1 << 16,
                    predicate: Optional[Callable] = None,
                    bits: int = 8, int4_group: int = INT4_GROUP):
    """Rewrite large linear weights to int8 (default) or group-int4 in a
    param pytree.

    ``predicate(path_list, leaf)`` overrides the default rule (parent-name suffix
    match + minimum element count). Layer-stacked weights (leading L axis) quantize
    with per-(layer, column) scales (per (layer, group, column) at 4 bits).

    ``int4_group``: rows per int4 scale group. Pass a huge value (or 0) for
    PER-COLUMN int4 scales — one scale group spanning the whole input dim, so
    every linear/projection stays a single int4-operand matmul exactly like
    the int8 path. Lossier than group-128 (absmax over the full column); perf
    numbers for both modes in docs/performance.md.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    int4_group = int4_group or (1 << 30)

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
                    if bits == 4:
                        q, s = quantize_embedding_int4(v, group=int4_group)
                        out["embedding_i4"] = q
                        out["row_scale4"] = s
                    else:
                        q, s = quantize_embedding(v)
                        out["embedding_i8"] = q
                        out["row_scale"] = s
                elif k == "weight" and pred(path + [k], v):
                    w = jnp.asarray(v, jnp.float32)
                    qfn = (partial(quantize_weight_int4, group=int4_group)
                           if bits == 4 else quantize_weight)
                    if w.ndim == 2:
                        q, s = qfn(w)
                    else:  # (L, in, out) scan-stacked
                        q, s = jax.vmap(qfn)(w)
                    if bits == 4:
                        out["weight_i4"], out["scale4"] = q, s
                    else:
                        out["weight_i8"], out["scale"] = q, s
                else:
                    out[k] = walk(v, path + [k])
            return out
        if isinstance(node, list):
            return [walk(v, path + [str(i)]) for i, v in enumerate(node)]
        return node

    return walk(params, [])


def quantization_report(params) -> dict:
    """Byte counts before/after for visibility. Tied/aliased subtrees (e.g.
    the shared NLLB embedding quantize_params keeps as one object) count
    once, mirroring quantize_params's ``seen`` dedup."""
    total = quant = 0
    seen: set = set()

    def walk(node):
        nonlocal total, quant
        if isinstance(node, dict):
            if id(node) in seen:
                return
            seen.add(id(node))
            for k, v in node.items():
                if k in ("weight_i8", "embedding_i8"):
                    quant += v.size
                    total += v.size
                elif k in ("weight_i4", "embedding_i4"):
                    quant += v.size // 2      # packed 2/byte in HBM
                    total += v.size // 2
                elif hasattr(v, "size") and not isinstance(v, (dict, list)):
                    total += v.size * v.dtype.itemsize
                else:
                    walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return {"quantized_weight_bytes": int(quant), "other_param_bytes": int(total - quant)}
