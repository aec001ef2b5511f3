"""Fused int8 tied-vocab projection + per-row top-k + logsumexp (Pallas/TPU).

The beam-search step's vocabulary work — logits = (h @ Q_int8^T) * row_scale,
log_softmax over V=256k, top-2K candidate selection — is HBM-bound on the
262 MB int8 table, but the XLA lowering also materializes the full (B*K, V)
fp32 logits tensor, pads/reshapes it, and runs a separate top-k custom call
(~0.58 ms/step measured of a 1.51 ms floor, docs/performance.md). This kernel
streams the table ONCE in tiles and emits only:

  - per-row top-``k`` logit values and vocab indices (exact: every global
    top-k element is a within-tile top-k element), and
  - per-tile (max, sum-of-exp) pairs that combine into an exact logsumexp.

The full logits tensor never exists. Beam search consumes candidates directly
(ops/beam_search.py candidate mode) — exact for the reference decode setup
(no step processors, unk_penalty=0; generator.py:59-84 defaults), with
k = 2*beam + 1 so min-length EOS suppression cannot exhaust the candidate set.

Reference counterpart: fairseq2.cpp:1249 (2*beam topk over full logits);
re-designed for the TPU memory system.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

NEG = -1e30


def _reference(x, table, row_scale, k):
    """Full-materialization reference (and CPU fallback): returns
    (top_vals (N, k) f32 raw logits, top_idx (N, k) i32, logz (N,) f32)."""
    logits = jnp.matmul(x, table.T.astype(x.dtype),
                        preferred_element_type=jnp.float32)
    logits = logits * row_scale[None, :]
    logz = jax.nn.logsumexp(logits, axis=-1)
    vals, idx = jax.lax.top_k(logits, k)
    return vals, idx.astype(jnp.int32), logz


def _kernel(x_ref, t_ref, s_ref, vals_ref, idx_ref, m_ref, se_ref, *,
            k: int, tile: int, v_total: int):
    """One grid step: rows [g*tile, (g+1)*tile) of the vocab table."""
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    x = x_ref[...]                                   # (N, D) bf16
    qt = t_ref[...]                                  # (tile, D) int8
    sc = s_ref[...]                                  # (tile,) f32
    N = x.shape[0]

    l = jax.lax.dot_general(x, qt.astype(x.dtype), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (N, tile)
    l = l * sc[None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (N, tile), 1)
    gcol = col + g * tile
    l = jnp.where(gcol < v_total, l, NEG)            # mask padded tail rows

    m = jnp.max(l, axis=1)                           # (N,)
    se = jnp.sum(jnp.where(gcol < v_total, jnp.exp(l - m[:, None]), 0.0),
                 axis=1)
    m_ref[...] = m[None, :, None]
    se_ref[...] = se[None, :, None]

    # iterative exact top-k within the tile
    lw = l
    vs, ids = [], []
    for _ in range(k):
        v = jnp.max(lw, axis=1)                      # (N,)
        hit = lw == v[:, None]
        a = jnp.min(jnp.where(hit, gcol, jnp.int32(2 ** 30)), axis=1)
        vs.append(v[:, None])
        ids.append(a[:, None])
        lw = jnp.where(gcol == a[:, None], NEG, lw)
    vals_ref[...] = jnp.concatenate(vs, axis=1)[None]   # (1, N, k)
    idx_ref[...] = jnp.concatenate(ids, axis=1)[None]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def _pallas_call(x, table, row_scale, *, k: int, tile: int, interpret=False):
    from jax.experimental import pallas as pl

    V, D = table.shape
    N = x.shape[0]
    G = -(-V // tile)
    grid = (G,)
    return pl.pallas_call(
        functools.partial(_kernel, k=k, tile=tile, v_total=V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, D), lambda g: (0, 0)),
            pl.BlockSpec((tile, D), lambda g: (g, 0)),
            pl.BlockSpec((tile,), lambda g: (g,)),
        ],
        out_specs=[
            pl.BlockSpec((1, N, k), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, N, k), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, N, k), jnp.float32),
            jax.ShapeDtypeStruct((G, N, k), jnp.int32),
            jax.ShapeDtypeStruct((G, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, N, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * V * D,
            bytes_accessed=V * D + 4 * V,
            transcendentals=N * V,
        ),
        interpret=interpret,
    )(x, table, row_scale)


def int8_vocab_topk(x, table_i8, row_scale, k: int, *,
                    use_pallas: bool | None = None,
                    tile: int = 2048, interpret: bool = False):
    """x (N, D) bf16/f32, table (V, D) int8, row_scale (V,) f32 ->
    (top_vals (N, k) raw logits f32, top_idx (N, k) i32, logz (N,) f32).

    ``lprobs = top_vals - logz[:, None]`` are exact log-probabilities of the
    top-k tokens. ``use_pallas=None`` auto-selects the kernel on TPU.
    """
    import os

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("SEAMLESS_PALLAS_VOCAB") != "0")
    if not use_pallas:
        return _reference(x, table_i8, row_scale, k)

    vals, idx, m, se = _pallas_call(x, table_i8, row_scale, k=k, tile=tile,
                                    interpret=interpret)
    # exact logsumexp across tiles (stable combine)
    m = m[..., 0].T                                  # (N, G)
    se = se[..., 0].T
    big = jnp.max(m, axis=1)                         # (N,)
    logz = big + jnp.log(jnp.sum(se * jnp.exp(m - big[:, None]), axis=1))
    # global top-k over the G*k per-tile candidates
    flat_vals = jnp.swapaxes(vals, 0, 1).reshape(x.shape[0], -1)   # (N, G*k)
    flat_idx = jnp.swapaxes(idx, 0, 1).reshape(x.shape[0], -1)
    top_vals, sel = jax.lax.top_k(flat_vals, k)
    top_idx = jnp.take_along_axis(flat_idx, sel, axis=1)
    return top_vals, top_idx, logz


# ---------------------------------------------------------------------------
# v2: block-max scheme — no serial in-kernel selection
# ---------------------------------------------------------------------------
#
# The v1 kernel's per-tile ITERATIVE top-k (k dependent max/mask rounds)
# measured ~0.24 ms of fixed overhead per tile (126 tiles -> 30.6 ms/call).
# v2 keeps the kernel fully vectorized: it streams the table, writes the
# (N, V) logits (one 5 MB HBM write — cheap), the per-tile logsumexp stats,
# and per-128-column BLOCK MAXIMA. Selection happens in XLA on the tiny
# (N, V/128) block-max matrix:
#
#   top-k blocks by max cover all top-k elements (if a top-k element's block
#   were not selected, k blocks would each hold an element above it — a
#   contradiction) -> gather those k 128-wide blocks -> top-k of k*128.

_BLK = 128


def _kernel_v2(x_ref, t_ref, s_ref, logits_ref, bmax_ref, m_ref, se_ref, *,
               tile: int, v_total: int):
    from jax.experimental import pallas as pl

    g = pl.program_id(0)
    x = x_ref[...]
    qt = t_ref[...]
    sc = s_ref[...]
    N = x.shape[0]

    l = jax.lax.dot_general(x, qt.astype(x.dtype), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    l = l * sc[None, :]
    gcol = jax.lax.broadcasted_iota(jnp.int32, (N, tile), 1) + g * tile
    l = jnp.where(gcol < v_total, l, NEG)

    m = jnp.max(l, axis=1)
    se = jnp.sum(jnp.where(gcol < v_total, jnp.exp(l - m[:, None]), 0.0),
                 axis=1)
    logits_ref[...] = l
    bmax_ref[...] = jnp.max(l.reshape(N, tile // _BLK, _BLK), axis=2)[None]
    m_ref[...] = m[None, :, None]
    se_ref[...] = se[None, :, None]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def _pallas_call_v2(x, table, row_scale, *, tile: int, interpret=False):
    from jax.experimental import pallas as pl

    V, D = table.shape
    N = x.shape[0]
    G = -(-V // tile)
    return pl.pallas_call(
        functools.partial(_kernel_v2, tile=tile, v_total=V),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((N, D), lambda g: (0, 0)),
            pl.BlockSpec((tile, D), lambda g: (g, 0)),
            pl.BlockSpec((tile,), lambda g: (g,)),
        ],
        out_specs=[
            pl.BlockSpec((N, tile), lambda g: (0, g)),
            pl.BlockSpec((1, N, tile // _BLK), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0)),
            pl.BlockSpec((1, N, 1), lambda g: (g, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, G * tile), jnp.float32),
            jax.ShapeDtypeStruct((G, N, tile // _BLK), jnp.float32),
            jax.ShapeDtypeStruct((G, N, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, N, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * V * D,
            bytes_accessed=V * D + 4 * V + 4 * N * V,
            transcendentals=N * V,
        ),
        interpret=interpret,
    )(x, table, row_scale)


def int8_vocab_topk_v2(x, table_i8, row_scale, k: int, *,
                       use_pallas: bool | None = None,
                       tile: int = 2048, interpret: bool = False):
    """Block-max variant of :func:`int8_vocab_topk` (same contract).

    ``tile`` is VMEM-bound: the kernel holds the int8 table tile AND its bf16
    conversion ((tile, D) x 3 bytes). tile=8192 at D=1024 exceeds v5e VMEM and
    fails Mosaic compilation; 2048 (6 MB) is the measured sweet spot — 1.14
    ms/call vs v1's 30.6 (iterative per-tile top-k) and XLA's 1.10 at the
    production shape (N=5, V=256102). See docs/performance.md."""
    import os

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu"
                      and os.environ.get("SEAMLESS_PALLAS_VOCAB") != "0")
    if not use_pallas:
        return _reference(x, table_i8, row_scale, k)

    N = x.shape[0]
    V = table_i8.shape[0]
    logits, bmax, m, se = _pallas_call_v2(x, table_i8, row_scale, tile=tile,
                                          interpret=interpret)
    # (G, N, tile/BLK) -> (N, G*tile/BLK) block-max matrix
    bmax = jnp.swapaxes(bmax, 0, 1).reshape(N, -1)
    m = m[..., 0].T
    se = se[..., 0].T
    big = jnp.max(m, axis=1)
    logz = big + jnp.log(jnp.sum(se * jnp.exp(m - big[:, None]), axis=1))

    # top-k candidate BLOCKS (ties included by construction: block max repeats
    # rank below k are irrelevant — see exactness argument above). Sort the
    # selected blocks ascending so the final top_k's positional tie-break
    # resolves equal values to the LOWEST vocab index (lax.top_k contract).
    kb = min(k, bmax.shape[1])
    _, blk_sel = jax.lax.top_k(bmax, kb)                      # (N, kb) block ids
    blk_sel = jnp.sort(blk_sel, axis=-1)
    base = blk_sel[..., None] * _BLK + jnp.arange(_BLK)[None, None, :]
    cand_idx = base.reshape(N, kb * _BLK)                     # (N, kb*128)
    cand = jnp.take_along_axis(logits, cand_idx, axis=1)
    # out-of-range candidates (padded tail blocks) already carry NEG
    top_vals, sel = jax.lax.top_k(cand, k)
    top_idx = jnp.take_along_axis(cand_idx, sel, axis=1).astype(jnp.int32)
    return top_vals, top_idx, logz
