"""Fused gather+insert+attend decode kernel (ops/kernels/decode_attention.py):
the Pallas kernel (interpret mode — hermetic on CPU) must match both its
pure-JAX reference and the composed ops/attention.py int8 step it replaces."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops import attention as A
from seamless_communication_tpu.ops.kernels.decode_attention import (
    _reference, fused_decode_self_attention_int8,
)

B, H, T, Dh = 5, 4, 24, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    return dict(
        q=jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32),
        kt=jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32),
        vt=jnp.asarray(rng.standard_normal((B, H, Dh)), jnp.float32),
        kc=jnp.asarray(rng.integers(-127, 128, (B, H, T, Dh)), jnp.int8),
        vc=jnp.asarray(rng.integers(-127, 128, (B, H, T, Dh)), jnp.int8),
        ks=jnp.asarray(rng.random((B, H, T)) * 0.1 + 0.01, jnp.float32),
        vs=jnp.asarray(rng.random((B, H, T)) * 0.1 + 0.01, jnp.float32),
        src=jnp.array([3, 0, 2, 1, 4], jnp.int32),
    )


@pytest.mark.parametrize("step", [0, 5, T - 1])
def test_kernel_matches_reference(data, step):
    d = data
    args = (d["q"], d["kt"], d["vt"], d["kc"], d["vc"], d["ks"], d["vs"],
            jnp.int32(step), d["src"])
    ref = _reference(*args)
    ker = fused_decode_self_attention_int8(*args, use_pallas=True,
                                           interpret=True)
    for i, (a, b) in enumerate(zip(ref, ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=f"out {i}")


def test_reference_matches_attention_step(data):
    """_reference == self_attention_step_nocache_int8 on the gathered cache
    (identity projections isolate the attention math)."""
    d = data
    eye = {"weight": jnp.eye(H * Dh), "bias": None}
    params = {k: eye for k in ("q_proj", "k_proj", "v_proj", "output_proj")}
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, 1, H * Dh)),
                    jnp.float32)
    step = jnp.int32(7)
    src = d["src"]
    y, kq, ks2, vq, vs2 = A.self_attention_step_nocache_int8(
        params, x, d["kc"][src], d["vc"][src], d["ks"][src], d["vs"][src],
        step, H)
    xh = A._split_heads(x, H)[:, :, 0]
    out, nk, nv, nks, nvs = _reference(xh, xh, xh, d["kc"], d["vc"],
                                       d["ks"], d["vs"], step, src)
    np.testing.assert_allclose(np.asarray(y[:, 0]),
                               np.asarray(A._merge_heads(out[:, :, None])[:, 0]),
                               rtol=2e-4, atol=2e-4)
    # written rows match the step function's quantized rows
    np.testing.assert_array_equal(np.asarray(nk[:, :, 7]), np.asarray(kq[:, :, 0]))
    np.testing.assert_allclose(np.asarray(nks[:, :, 7]), np.asarray(ks2[:, :, 0]))
    # history preserved from the SOURCE beams
    np.testing.assert_array_equal(np.asarray(nk[:, :, :7]),
                                  np.asarray(d["kc"][src][:, :, :7]))


@pytest.mark.parametrize("step", [0, 5, T - 1])
def test_indexed_kernel_matches_indexed_reference(data, step):
    """Lazy-reorder variant: the Pallas indexed kernel (interpret mode) must
    match the pure-JAX row-origin-indexed reference."""
    from seamless_communication_tpu.ops.kernels.decode_attention import (
        _indexed_reference, indexed_decode_self_attention_int8,
    )
    d = data
    rng = np.random.default_rng(3)
    row_src = jnp.asarray(rng.integers(0, B, (B, T)), jnp.int32)
    args = (d["q"], d["kt"], d["vt"], d["kc"], d["vc"], d["ks"], d["vs"],
            row_src, jnp.int32(step))
    ref = _indexed_reference(*args)
    ker = indexed_decode_self_attention_int8(*args, use_pallas=True,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ker),
                               rtol=2e-5, atol=2e-5)


def test_indexed_reference_matches_physical_gather(data):
    """With row_src rows all drawn from one permutation, the indexed read
    equals the physical gather+attend reference."""
    from seamless_communication_tpu.ops.kernels.decode_attention import (
        _indexed_reference,
    )
    d = data
    step = jnp.int32(9)
    src = d["src"]
    row_src = jnp.broadcast_to(src[:, None], (B, T))
    ref_full = _reference(d["q"], d["kt"], d["vt"], d["kc"], d["vc"],
                          d["ks"], d["vs"], step, src)
    got = _indexed_reference(d["q"], d["kt"], d["vt"], d["kc"], d["vc"],
                             d["ks"], d["vs"], row_src, step)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_full[0]),
                               rtol=2e-5, atol=2e-5)


def test_lazy_reorder_is_opt_in(monkeypatch):
    """The classic fused-gather physical reorder is the DEFAULT (no row_src
    table): isolated on-device A/B measured it at 1.97 ms/step vs the one-hot
    lazy formulation's 2.77 on the v2-large beam-5 bench (round 4,
    docs/performance.md — the round-3 interleaved A/B had been confounded by
    two-executable HBM co-residency). SEAMLESS_LAZY_REORDER=1 opts in."""
    import jax

    from seamless_communication_tpu.ops.transformer import (
        TransformerConfig, decoder_cache_init, transformer_stack_init,
    )

    monkeypatch.delenv("SEAMLESS_LAZY_REORDER", raising=False)
    cfg = TransformerConfig(dim=64, num_layers=2, num_heads=16,
                            ffn_inner_dim=128, vocab_size=100,
                            max_seq_len=2048, has_cross_attention=True)
    params = transformer_stack_init(jax.random.PRNGKey(0), cfg)
    enc_small = jax.random.normal(jax.random.PRNGKey(1), (5, 4, 64))
    c = decoder_cache_init(params, cfg, enc_small, 1024, kv_int8=True,
                           per_layer=True)
    assert c.row_src is None              # classic by default
    # env override opts into the lazy row-origin path
    monkeypatch.setenv("SEAMLESS_LAZY_REORDER", "1")
    c = decoder_cache_init(params, cfg, enc_small, 1024, kv_int8=True,
                           per_layer=True)
    assert c.row_src is not None
    monkeypatch.setenv("SEAMLESS_LAZY_REORDER", "0")
    c = decoder_cache_init(params, cfg, enc_small, 1024, kv_int8=True,
                           per_layer=True)
    assert c.row_src is None


@pytest.mark.parametrize("step", [0, 5, T - 1])
def test_indexed_onehot_matches_indexed_reference(data, step):
    """Vectorized lazy-reorder formulation (the SEAMLESS_LAZY_KERNEL=onehot
    default): one-hot einsum select must match the row-origin gather
    reference — logits bit-identically, output to f32 reassociation."""
    from seamless_communication_tpu.ops.kernels.decode_attention import (
        _indexed_onehot, _indexed_reference,
    )
    d = data
    rng = np.random.default_rng(4)
    row_src = jnp.asarray(rng.integers(0, B, (B, T)), jnp.int32)
    args = (d["q"], d["kt"], d["vt"], d["kc"], d["vc"], d["ks"], d["vs"],
            row_src, jnp.int32(step))
    ref = _indexed_reference(*args)
    got = _indexed_onehot(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_indexed_dispatch_default_is_onehot(data, monkeypatch):
    """indexed_decode_self_attention_int8 with no explicit use_pallas must
    route through the onehot formulation (and fall back to gather above the
    intermediate-size cap)."""
    from seamless_communication_tpu.ops.kernels import decode_attention as DA

    d = data
    rng = np.random.default_rng(5)
    row_src = jnp.asarray(rng.integers(0, B, (B, T)), jnp.int32)
    args = (d["q"], d["kt"], d["vt"], d["kc"], d["vc"], d["ks"], d["vs"],
            row_src, jnp.int32(7))

    called = {}
    real = DA._indexed_onehot

    def spy(*a, **k):
        called["hit"] = True
        return real(*a, **k)

    monkeypatch.setattr(DA, "_indexed_onehot", spy)
    out = DA.indexed_decode_self_attention_int8(*args)
    assert called.get("hit") is True
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(DA._indexed_reference(*args)),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Packed-int4 KV variant
# ---------------------------------------------------------------------------

def test_int4_pack_unpack_roundtrip():
    """quantize_kv_rows_int4 pack -> unpack must be exact for every value the
    quantizer can emit, and dequantized rows must be within one scale step."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    packed, scale = A.quantize_kv_rows_int4(x)
    assert packed.shape == (2, 3, 8) and packed.dtype == jnp.int8
    lo, hi = A.unpack_int4(packed)
    q = np.concatenate([np.asarray(lo), np.asarray(hi)], axis=-1)
    assert q.min() >= -7 and q.max() <= 7
    deq = q * np.asarray(scale)[..., None]
    np.testing.assert_allclose(deq, np.asarray(x),
                               atol=np.asarray(scale).max() / 2 + 1e-6)
    # pack -> unpack is bit-exact over the full int4 range, including every
    # (lo, hi) sign combination
    vals = np.asarray(np.meshgrid(np.arange(-7, 8), np.arange(-7, 8))
                      ).reshape(2, -1).T.astype(np.int8)       # (225, 2)
    lo_in = jnp.asarray(vals[:, :1])
    hi_in = jnp.asarray(vals[:, 1:])
    packed2 = (lo_in & jnp.int8(0x0F)) | (hi_in << 4)
    lo3, hi3 = A.unpack_int4(packed2)
    np.testing.assert_array_equal(np.asarray(lo3), vals[:, :1])
    np.testing.assert_array_equal(np.asarray(hi3), vals[:, 1:])


@pytest.fixture(scope="module")
def data4(data):
    rng = np.random.default_rng(7)
    d = dict(data)
    d["kc"] = jnp.asarray(rng.integers(-128, 128, (B, H, T, Dh // 2)),
                          jnp.int8)
    d["vc"] = jnp.asarray(rng.integers(-128, 128, (B, H, T, Dh // 2)),
                          jnp.int8)
    return d


@pytest.mark.parametrize("step", [0, 5, T - 1])
def test_int4_kernel_matches_reference(data4, step):
    from seamless_communication_tpu.ops.kernels.decode_attention import (
        _reference_int4, fused_decode_self_attention_int4,
    )

    d = data4
    args = (d["q"], d["kt"], d["vt"], d["kc"], d["vc"], d["ks"], d["vs"],
            jnp.int32(step), d["src"])
    ref = _reference_int4(*args)
    ker = fused_decode_self_attention_int4(*args, use_pallas=True,
                                           interpret=True)
    for i, (a, b) in enumerate(zip(ref, ker)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5, err_msg=f"out {i}")


def test_int4_reference_matches_attention_step(data4):
    """_reference_int4 == self_attention_step_nocache_int4 on the gathered
    cache (identity projections isolate the attention math)."""
    from seamless_communication_tpu.ops.kernels.decode_attention import (
        _reference_int4,
    )

    d = data4
    eye = {"weight": jnp.eye(H * Dh), "bias": None}
    params = {k: eye for k in ("q_proj", "k_proj", "v_proj", "output_proj")}
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, 1, H * Dh)),
                    jnp.float32)
    step = jnp.int32(7)
    src = d["src"]
    y, kq, ks2, vq, vs2 = A.self_attention_step_nocache_int4(
        params, x, d["kc"][src], d["vc"][src], d["ks"][src], d["vs"][src],
        step, H)
    xh = A._split_heads(x, H)[:, :, 0]
    out, nk, nv, nks, nvs = _reference_int4(xh, xh, xh, d["kc"], d["vc"],
                                            d["ks"], d["vs"], step, src)
    np.testing.assert_allclose(
        np.asarray(y[:, 0]),
        np.asarray(A._merge_heads(out[:, :, None])[:, 0]),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(nk[:, :, 7]),
                                  np.asarray(kq[:, :, 0]))
    np.testing.assert_array_equal(np.asarray(nk[:, :, :7]),
                                  np.asarray(d["kc"][src][:, :, :7]))


def test_int4_beam_decode_runs_end_to_end():
    """A tiny beam-5 decode over a DecoderCacheQ4 must run and emit finite
    tokens on the XLA fallback path (the TPU kernel path shares its math,
    pinned above)."""
    from seamless_communication_tpu.models.nllb.model import NllbConfig
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )
    from seamless_communication_tpu.ops.transformer import DecoderCacheQ4

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    fb = jnp.asarray(rng.standard_normal((1, 64, 80)), jnp.float32)
    enc = unity.encode_speech(params, cfg, fb, jnp.array([64]))
    K, Tm = 5, 24
    enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                 jnp.repeat(enc.lengths, K, axis=0))
    step_fn, cache_fn = unity.make_text_decode_step(params, cfg, enc_bk)
    cache = cache_fn(Tm, True, kv_bits=4)
    assert isinstance(cache, DecoderCacheQ4)
    opts = BeamSearchOptions(beam_size=K, max_len=Tm, pad_idx=0, unk_idx=1,
                             eos_idx=3)
    res = jax.jit(lambda c: beam_search(
        step_fn, c, jnp.asarray([[3, 5]], jnp.int32),
        jnp.asarray([2], jnp.int32), opts, cfg.nllb.vocab_size,
        src_to_step=True))(cache)
    toks = np.asarray(res.tokens[0, 0])
    assert np.isfinite(np.asarray(res.scores[0, 0]))
    assert toks[0] == 3 and toks[1] == 5
