"""Multi-chip inference sharding: run the UnitY forward over a ("data","model")
mesh on 8 virtual devices and check tensor-parallel results match the unsharded
reference — the serving-side counterpart of the trainer dryrun (SURVEY.md §2.11
TPU-native mapping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.parallel.sharding import (
    data_sharding, make_mesh, shard_params, with_param_shardings,
)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tp_sharded_forward_matches_unsharded():
    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)

    B, T_FRAMES, T_TEXT = 4, 64, 10
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.standard_normal((B, T_FRAMES, 80)), jnp.float32)
    flens = jnp.full((B,), T_FRAMES, jnp.int32)
    ids = jnp.asarray(rng.integers(4, 200, (B, T_TEXT)), jnp.int32)
    idlens = jnp.full((B,), T_TEXT, jnp.int32)

    def fwd(p, fb, fl, tok, tl):
        enc = unity.encode_speech(p, cfg, fb, fl)
        feats = unity.decode_text(p, cfg, tok, enc, self_lengths=tl)
        return unity.project(p, feats)

    ref = jax.jit(fwd)(params, fbank, flens, ids, idlens)

    mesh = make_mesh(data=2, model=4)
    with mesh:
        sharded = shard_params(params, mesh)
        pspecs = with_param_shardings(params, mesh)
        dspec = data_sharding(mesh)
        fwd_sharded = jax.jit(
            fwd, in_shardings=(pspecs, dspec, dspec, dspec, dspec))
        got = fwd_sharded(sharded, fbank, flens, ids, idlens)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_param_sharding_rules_hit_model_axis():
    """Large projections must actually shard over the model axis (not silently
    replicate)."""
    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(data=2, model=4)
    pspecs = with_param_shardings(params, mesh)
    q_spec = pspecs["text_decoder"]["stack"]["layers"]["self_attn"]["q_proj"][
        "weight"].spec
    assert "model" in str(q_spec)
    ffn_spec = pspecs["text_decoder"]["stack"]["layers"]["ffn"]["inner_proj"][
        "weight"].spec
    assert "model" in str(ffn_spec)