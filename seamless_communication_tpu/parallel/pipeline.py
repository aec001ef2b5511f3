"""GPipe-style pipeline parallelism over scan-stacked layers.

The reference has no pipeline parallelism at all (its only distributed mode is
DDP, cli/m4t/finetune/dist_utils.py:63-69); this module EXCEEDS it with a
TPU-native SPMD pipeline: the scan-stacked layer axis (L, ...) is sharded over
a mesh axis ("pipe"), every device runs the same program under ``shard_map``,
and activations flow stage-to-stage over ICI via ``jax.lax.ppermute`` — the
classic circular-schedule formulation from the public scaling literature
(jax-ml.github.io/scaling-book, pipelining chapter).

Semantics: ``pipeline_stack(body, stacked, x, ...)`` computes exactly

    for l in range(L): x = body(x, stacked[l])

but with layers split into S = mesh.shape[axis] contiguous stages and the
batch split into ``n_micro`` microbatches. Bubble fraction is
(S-1)/(n_micro + S - 1). Grads flow through ppermute, so the same op serves
training; it composes with data parallelism (pass ``x_spec=P("data")``).

Design notes:
  - One (M + S - 1)-tick ``lax.scan``; each tick runs the local stage's
    layers (inner ``lax.scan`` over the L/S local layers) on the activation
    received last tick, then rotates outputs one stage forward. Static
    shapes, no data-dependent control flow — XLA overlaps the ppermute
    with the next tick's compute.
  - Stage 0 *injects* microbatch t at tick t; the last stage *collects* its
    output of tick t into slot t-(S-1). Both are masked selects, not
    control flow.
  - The collected buffer is psum-broadcast over the pipe axis at the end so
    the result is bitwise identical on every stage.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


class PipelineCtx(NamedTuple):
    mesh: Mesh
    axis: str
    n_micro: int
    x_spec: Optional[P]


_state = threading.local()


def active_pipeline() -> Optional[PipelineCtx]:
    """The pipeline context installed by :func:`pipeline_layers`, if any."""
    return getattr(_state, "ctx", None)


@contextlib.contextmanager
def pipeline_layers(mesh: Mesh, *, axis: str = "pipe", n_micro: int = 2,
                    x_spec: Optional[P] = None):
    """Route eligible layer scans through :func:`pipeline_stack`.

    Trace-time flag, same design as ``ops.remat.remat_layers``: enable it
    around the loss/forward computation; stacks that check
    :func:`active_pipeline` (conformer + transformer stacks) run as a GPipe pipeline
    over ``mesh`` when their layer count divides the stage count. Composes
    with remat (each layer body is checkpointed inside its stage).
    """
    prev = active_pipeline()
    _state.ctx = PipelineCtx(mesh, axis, n_micro, x_spec)
    try:
        yield
    finally:
        _state.ctx = prev


def pipeline_or_none(layer_fn: Callable, stacked_params, x: jax.Array,
                     tensors: dict):
    """Run ``layer_fn`` over the stacked layers as a pipeline when an
    applicable :func:`pipeline_layers` context is active; return None when
    the caller should fall back to its sequential ``lax.scan``.

    layer_fn: ``(h, tensors: dict, layer_params) -> h``. Entries of
    ``tensors`` with leading axis == batch are microbatched alongside ``x``
    (per-sample masks, encoder outputs); the rest (broadcast biases, None)
    are closed over. Composes with ``ops.remat`` (each layer is
    checkpointed inside its stage when remat is enabled).
    """
    ctx = active_pipeline()
    if ctx is None:
        return None
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    S = ctx.mesh.shape[ctx.axis]
    B = x.shape[0]
    if L % S or B % ctx.n_micro:
        return None

    per = {k: v for k, v in tensors.items()
           if v is not None and getattr(v, "shape", ())[:1] == (B,)}
    closed = {k: v for k, v in tensors.items() if k not in per}

    def body(h, ex, lp):
        tens = dict(closed)
        tens.update(ex)
        return layer_fn(h, tens, lp)

    from seamless_communication_tpu.ops import remat as _remat
    if _remat.is_enabled():
        body = jax.checkpoint(body)
    if per:
        return pipeline_stack(body, stacked_params, x, mesh=ctx.mesh,
                              axis=ctx.axis, n_micro=ctx.n_micro,
                              extras=per, x_spec=ctx.x_spec)
    return pipeline_stack(lambda h, lp: body(h, {}, lp), stacked_params, x,
                          mesh=ctx.mesh, axis=ctx.axis,
                          n_micro=ctx.n_micro, x_spec=ctx.x_spec)


def pipeline_stack(body: Callable, stacked_params, x: jax.Array, *,
                   mesh: Mesh, axis: str = "pipe", n_micro: int,
                   extras=None, x_spec: Optional[P] = None):
    """Apply L scan-stacked layers as an S-stage GPipe pipeline.

    body: ``(x_mb, layer_params)`` or, when ``extras`` is given,
        ``(x_mb, extras_mb, layer_params)`` -> x_mb, one layer's forward on
        one microbatch (shape/dtype preserved). Close over replicated
        constants (configs, shared biases).
    stacked_params: pytree with a leading layer axis L on every leaf,
        L % S == 0; resharded to put contiguous layer blocks on each stage.
    x: (B, ...) activations, B % n_micro == 0.
    extras: optional pytree of per-sample arrays with leading axis B
        (padding masks, per-sample biases) microbatched alongside ``x``.
    x_spec: PartitionSpec for x/extras over the *other* mesh axes (e.g.
        P("data") to compose pp x dp). Must not mention ``axis``.

    Composition note: inside the shard_map each stage holds its layer block
    WHOLE — dp composes via ``x_spec``, but a "model" mesh axis is
    replicated within the pipelined stack (stage memory = full layers).
    Megatron-style tp-inside-pp would need in-body collectives; today tp
    applies to the non-pipelined parts of the model (vocab projection,
    embeddings, any stack that falls back to scan).

    Returns (B, ...), equal to the sequential scan over all L layers.
    """
    S = mesh.shape[axis]
    B = x.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"layers {L} not divisible by pipeline stages {S}")
    if x_spec is None:
        x_spec = P()

    M = n_micro
    T = M + S - 1

    def _specs(tree, spec):
        return jax.tree.map(lambda _: spec, tree)

    p_specs = _specs(stacked_params, P(axis))
    e_specs = _specs(extras, x_spec) if extras is not None else None

    def run(local_params, xs, *maybe_extras):
        stage = jax.lax.axis_index(axis)
        if xs.shape[0] % M:
            raise ValueError(
                f"local batch {xs.shape[0]} not divisible by n_micro {M} "
                "(global batch must divide data_parallel * n_micro)")
        mb = xs.shape[0] // M  # local (possibly dp-sharded) microbatch size
        micro = xs.reshape(M, mb, *xs.shape[1:])
        if maybe_extras:
            ex_micro = jax.tree.map(
                lambda a: a.reshape(M, a.shape[0] // M, *a.shape[1:]),
                maybe_extras[0])
        else:
            ex_micro = None

        def local_stage(h, ex):
            if ex_micro is None:
                step = lambda c, p: (body(c, p), None)
            else:
                step = lambda c, p: (body(c, ex, p), None)
            out, _ = jax.lax.scan(step, h, local_params)
            return out

        zero = jnp.zeros((mb,) + xs.shape[1:], xs.dtype)
        outs0 = jnp.zeros((M, mb) + xs.shape[1:], xs.dtype)

        def tick(carry, t):
            recv, outs = carry
            # every stage addresses the microbatch it is CURRENTLY working
            # on: stage s at tick t holds microbatch t-s (clipped; invalid
            # ticks compute garbage that is never collected)
            mslot = jnp.clip(t - stage, 0, M - 1)
            inj = micro[mslot]
            ex = (jax.tree.map(lambda a: a[mslot], ex_micro)
                  if ex_micro is not None else None)
            h = jnp.where(stage == 0, inj, recv)
            out = local_stage(h, ex)
            slot = t - (S - 1)
            valid = (stage == S - 1) & (slot >= 0) & (slot < M)
            onehot = ((jnp.arange(M) == jnp.clip(slot, 0, M - 1)) & valid)
            outs = jnp.where(onehot.reshape((M,) + (1,) * out.ndim),
                             out[None], outs)
            recv = jax.lax.ppermute(out, axis,
                                    [(i, (i + 1) % S) for i in range(S)])
            return (recv, outs), None

        (_, outs), _ = jax.lax.scan(tick, (zero, outs0), jnp.arange(T))
        outs = jax.lax.psum(
            jnp.where(stage == S - 1, outs, jnp.zeros_like(outs)), axis)
        return outs.reshape(-1, *xs.shape[1:])

    in_specs = (p_specs, x_spec) + ((e_specs,) if extras is not None else ())
    args = (stacked_params, x) + ((extras,) if extras is not None else ())
    try:
        fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
                       check_vma=False)
    except TypeError:  # older jax.experimental API
        fn = shard_map(run, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
                       check_rep=False)
    return fn(*args)
