"""FiLM conditioning layer (reference models/unity/film.py:15-68):
y = (s_gamma * gamma + 1) * x + s_beta * beta, with [gamma|beta] = proj(cond)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import linear, linear_init


def film_init(key: jax.Array, cond_dim: int, embed_dim: int, *, dtype=jnp.float32) -> dict:
    return {
        "proj": linear_init(key, cond_dim, 2 * embed_dim, dtype=dtype),
        "s_gamma": jnp.ones((1,), dtype),
        "s_beta": jnp.ones((1,), dtype),
    }


def film(params: dict, x: jax.Array, cond: jax.Array) -> jax.Array:
    """x: (B, T, H); cond: (B, 1, C) (broadcast over time)."""
    gb = linear(params["proj"], cond)
    gamma, beta = jnp.split(gb, 2, axis=-1)
    gamma = params["s_gamma"].astype(x.dtype) * gamma
    beta = params["s_beta"].astype(x.dtype) * beta
    return (gamma + 1.0) * x + beta
