"""pipeline_stack == sequential scan (forward + grads), incl. pp x dp."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from seamless_communication_tpu.parallel.pipeline import pipeline_stack


def _body(x, p):
    return jnp.tanh(x @ p["w"] + p["b"])


def _body_ex(x, ex, p):
    return jnp.tanh(x @ p["w"] + p["b"]) * ex["mask"]


def _stacked(key, L, D):
    kw, kb = jax.random.split(key)
    return {"w": jax.random.normal(kw, (L, D, D)) * 0.3,
            "b": jax.random.normal(kb, (L, D)) * 0.1}


def _seq(body, stacked, x, *extra):
    L = jax.tree.leaves(stacked)[0].shape[0]
    for l in range(L):
        p = jax.tree.map(lambda a: a[l], stacked)
        x = body(x, *extra, p) if extra else body(x, p)
    return x


@pytest.mark.parametrize("S,n_micro", [(4, 4), (2, 8), (8, 2)])
def test_pipeline_matches_sequential(S, n_micro):
    devs = jax.devices()[:S]
    mesh = Mesh(np.asarray(devs).reshape(S), ("pipe",))
    L, B, D = 8, 16, 8
    stacked = _stacked(jax.random.PRNGKey(0), L, D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 4, D))

    want = _seq(_body, stacked, x)
    got = jax.jit(lambda s, x: pipeline_stack(
        _body, s, x, mesh=mesh, axis="pipe", n_micro=n_micro))(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_extras_and_grads():
    S, n_micro = 4, 4
    mesh = Mesh(np.asarray(jax.devices()[:S]).reshape(S), ("pipe",))
    L, B, D = 4, 8, 8
    stacked = _stacked(jax.random.PRNGKey(0), L, D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 4, D))
    mask = (jax.random.uniform(jax.random.PRNGKey(2), (B, 4, 1)) > 0.2)
    extras = {"mask": mask.astype(x.dtype)}

    def loss_pipe(s):
        y = pipeline_stack(_body_ex, s, x, mesh=mesh, axis="pipe",
                           n_micro=n_micro, extras=extras)
        return jnp.sum(y ** 2)

    def loss_seq(s):
        return jnp.sum(_seq(_body_ex, s, x, extras) ** 2)

    gp = jax.jit(jax.grad(loss_pipe))(stacked)
    gs = jax.grad(loss_seq)(stacked)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4), gp, gs)


def test_pipeline_composes_with_dp():
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    L, B, D = 4, 8, 8
    stacked = _stacked(jax.random.PRNGKey(0), L, D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 4, D))

    want = _seq(_body, stacked, x)
    got = jax.jit(lambda s, x: pipeline_stack(
        _body, s, x, mesh=mesh, axis="pipe", n_micro=2,
        x_spec=P("data")))(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
