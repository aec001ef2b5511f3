"""Gradient rematerialization toggle for the layer scans.

Training 1-2B-param UnitY models stores every layer's activations for the
backward pass; with 24-48 transformer/conformer layers that dominates HBM.
``with remat_layers():`` makes every layer-scan body a ``jax.checkpoint``
region, so the backward pass recomputes per-layer activations instead of
storing them — the standard TPU FLOPs-for-memory trade (jax.checkpoint docs;
reference has no equivalent, torch's is activation_checkpointing).

The flag is read at TRACE time: enable it around the loss/grad computation
(the trainer does this when ``FinetuneParams.remat`` is set), not around the
jitted call's execution.

Selective remat (VERDICT r04): ``remat_layers(policy="dots")`` checkpoints
each layer with ``jax.checkpoint_policies.dots_with_no_batch_dims_saveable``
— MXU (matmul) outputs are SAVED and only the elementwise/norm work between
them is recomputed, converting most of the full-remat 2NT re-forward back
into throughput at the cost of storing the per-layer dot outputs (dominated
by the (B, T, ffn_inner) activations). ``policy="full"`` is the classic
save-nothing layer remat; ``policy="offload_dots"`` offloads the dot outputs
to host memory instead (pinned-host round trip through the axon tunnel —
measured, see docs/performance.md).
"""

from __future__ import annotations

import contextlib
import threading

import jax

_state = threading.local()

_POLICIES = {
    "full": None,
    "dots": "dots_with_no_batch_dims_saveable",
    "offload_dots": "offload_dot_with_no_batch_dims",
}


def is_enabled() -> bool:
    return getattr(_state, "on", False)


def current_policy() -> str:
    return getattr(_state, "policy", "full")


@contextlib.contextmanager
def remat_layers(policy: str = "full"):
    if policy not in _POLICIES:
        raise ValueError(f"unknown remat policy {policy!r}; "
                         f"one of {sorted(_POLICIES)}")
    prev, prev_policy = is_enabled(), current_policy()
    _state.on, _state.policy = True, policy
    try:
        yield
    finally:
        _state.on, _state.policy = prev, prev_policy


def maybe_checkpoint(body):
    """Wrap a lax.scan body in jax.checkpoint when remat is enabled."""
    if not is_enabled():
        return body
    name = _POLICIES[current_policy()]
    if name is None:
        return jax.checkpoint(body)
    return jax.checkpoint(body, policy=getattr(jax.checkpoint_policies, name))
