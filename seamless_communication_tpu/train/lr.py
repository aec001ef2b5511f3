"""Myle LR schedule (fairseq2 MyleLR, used at cli/m4t/finetune/trainer.py:23,321):
linear warmup to base lr, then inverse-sqrt decay ~ sqrt(warmup/step)."""

from __future__ import annotations

import jax.numpy as jnp


def myle_lr(base_lr: float, warmup_steps: int = 100):
    def schedule(step):
        step = jnp.maximum(step, 1)
        warm = base_lr * step / warmup_steps
        decay = base_lr * jnp.sqrt(warmup_steps / step)
        return jnp.where(step < warmup_steps, warm, decay)
    return schedule
