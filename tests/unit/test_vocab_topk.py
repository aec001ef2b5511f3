"""Fused vocab-projection + top-k + logsumexp kernel
(ops/kernels/vocab_topk.py): interpret-mode Pallas parity vs the
full-materialization reference, including tile-boundary and tie-break
semantics (lowest vocab index first, matching jax.lax.top_k)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.kernels.vocab_topk import (
    _reference, int8_vocab_topk,
)

N, D, V, K = 5, 32, 1000, 11


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        x=jnp.asarray(rng.standard_normal((N, D)), jnp.float32),
        table=jnp.asarray(rng.integers(-127, 128, (V, D)), jnp.int8),
        scale=jnp.asarray(rng.random(V) * 0.01 + 0.001, jnp.float32),
    )


@pytest.mark.parametrize("tile", [128, 256])   # V % 128 == 0? 1000 % 128 != 0
def test_kernel_matches_reference(data, tile):
    d = data
    ref_v, ref_i, ref_z = _reference(d["x"], d["table"], d["scale"], K)
    got_v, got_i, got_z = int8_vocab_topk(d["x"], d["table"], d["scale"], K,
                                          use_pallas=True, tile=tile,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(ref_z), np.asarray(got_z), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_v), np.asarray(got_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_tie_break_lowest_index(data):
    """Duplicate logit values (tiled table) must resolve to the lowest vocab
    index — jax.lax.top_k's contract, required for reference-identical beams."""
    d = data
    table2 = jnp.asarray(np.tile(np.asarray(d["table"][:100]), (10, 1)), jnp.int8)
    scale2 = jnp.asarray(np.tile(np.asarray(d["scale"][:100]), 10), jnp.float32)
    r = _reference(d["x"], table2, scale2, K)
    g = int8_vocab_topk(d["x"], table2, scale2, K, use_pallas=True, tile=128,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(r[1]), np.asarray(g[1]))


def test_lprobs_are_exact_log_probs(data):
    d = data
    vals, idx, logz = int8_vocab_topk(d["x"], d["table"], d["scale"], K,
                                      use_pallas=True, tile=128, interpret=True)
    logits = np.asarray(d["x"]) @ np.asarray(d["table"], np.float32).T
    logits = logits * np.asarray(d["scale"])[None, :]
    full = logits - np.log(np.exp(logits - logits.max(1, keepdims=True)
                                  ).sum(1, keepdims=True)) \
        - logits.max(1, keepdims=True)
    lp = np.asarray(vals - logz[:, None])
    for n in range(N):
        np.testing.assert_allclose(lp[n], full[n][np.asarray(idx)[n]],
                                   atol=1e-4)


@pytest.mark.parametrize("tile", [128, 256])
def test_v2_blockmax_matches_reference(data, tile):
    """v2 (vectorized block-max selection) must be exact like v1."""
    from seamless_communication_tpu.ops.kernels.vocab_topk import (
        int8_vocab_topk_v2,
    )
    d = data
    ref_v, ref_i, ref_z = _reference(d["x"], d["table"], d["scale"], K)
    got_v, got_i, got_z = int8_vocab_topk_v2(d["x"], d["table"], d["scale"], K,
                                             use_pallas=True, tile=tile,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(ref_z), np.asarray(got_z), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_v), np.asarray(got_v),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref_i), np.asarray(got_i))


def test_v2_tie_break_lowest_index(data):
    from seamless_communication_tpu.ops.kernels.vocab_topk import (
        int8_vocab_topk_v2,
    )
    d = data
    table2 = jnp.asarray(np.tile(np.asarray(d["table"][:100]), (10, 1)), jnp.int8)
    scale2 = jnp.asarray(np.tile(np.asarray(d["scale"][:100]), 10), jnp.float32)
    r = _reference(d["x"], table2, scale2, K)
    g = int8_vocab_topk_v2(d["x"], table2, scale2, K, use_pallas=True,
                           tile=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(r[1]), np.asarray(g[1]))
