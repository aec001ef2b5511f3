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
"""

from __future__ import annotations

import contextlib
import threading

import jax

_state = threading.local()


def is_enabled() -> bool:
    return getattr(_state, "on", False)


@contextlib.contextmanager
def remat_layers():
    prev = is_enabled()
    _state.on = True
    try:
        yield
    finally:
        _state.on = prev


def maybe_checkpoint(body):
    """Wrap a lax.scan body in jax.checkpoint when remat is enabled."""
    if is_enabled():
        return jax.checkpoint(body)
    return body
