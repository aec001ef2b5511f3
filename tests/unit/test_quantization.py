"""int8 weight-only quantization: accuracy, pytree rewrite, end-to-end decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import linear, linear_init
from seamless_communication_tpu.ops.quantization import (
    linear_quantized, quantization_report, quantize_params, quantize_weight,
)


def test_quantize_roundtrip_accuracy():
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (256, 512)) * 0.02
    q, s = quantize_weight(w)
    deq = q.astype(jnp.float32) * s[None, :]
    rel = float(jnp.max(jnp.abs(deq - w)) / jnp.max(jnp.abs(w)))
    assert rel < 1.0 / 100   # <= 1 lsb of 127

    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    y_ref = x @ w
    y_q = linear_quantized({"weight_i8": q, "scale": s}, x)
    err = float(jnp.max(jnp.abs(y_q - y_ref)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    assert err < 0.02


def test_quantize_params_rewrites_and_linear_dispatches():
    key = jax.random.PRNGKey(0)
    params = {"q_proj": linear_init(key, 512, 512),
              "layer_norm": {"scale": jnp.ones(512), "bias": jnp.zeros(512)}}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    y_ref = linear(params["q_proj"], x)
    qp = quantize_params(params)
    assert "weight_i8" in qp["q_proj"] and "weight" not in qp["q_proj"]
    assert "scale" in qp["layer_norm"]          # untouched non-linear params
    y_q = linear(qp["q_proj"], x)               # dispatch via linear()
    rel = float(jnp.max(jnp.abs(y_q - y_ref)) / jnp.max(jnp.abs(y_ref)))
    assert rel < 0.02
    rep = quantization_report(qp)
    assert rep["quantized_weight_bytes"] == 512 * 512


def test_quantize_stacked_layers():
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 256, 256)) * 0.02
    params = {"inner_proj": {"weight": w}}
    qp = quantize_params(params)
    assert qp["inner_proj"]["weight_i8"].shape == (3, 256, 256)
    assert qp["inner_proj"]["scale"].shape == (3, 256)


def test_quantized_embedding_and_tied_projection():
    from seamless_communication_tpu.ops.modules import embedding, embedding_init
    from seamless_communication_tpu.ops.transformer import tied_projection
    p = embedding_init(jax.random.PRNGKey(0), 1000, 128)
    qp = quantize_params({"embed": p}, min_size=1024)["embed"]
    assert "embedding_i8" in qp and qp["row_scale"].shape == (1000,)
    ids = jnp.asarray([[1, 5, 999]])
    ref = embedding(p, ids, scale=128 ** 0.5)
    got = embedding(qp, ids, scale=128 ** 0.5)
    assert float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref))) < 0.01
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 128))
    ref = tied_projection(p, x)
    got = tied_projection(qp, x)
    assert float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref))) < 0.02


def test_quantize_preserves_tied_embeddings():
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    cfg = get_arch("tiny_v2")
    p = unity.unity_init(jax.random.PRNGKey(0), cfg)
    assert p["text_encoder"]["embed"] is p["text_decoder"]["embed"]
    qp = quantize_params(p, min_size=1024)
    assert qp["text_encoder"]["embed"] is qp["text_decoder"]["embed"]


def test_quantized_unity_decode_close_to_fp():
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=1024)

    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.standard_normal((1, 64, 80)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, 200, (1, 8)), jnp.int32)
    lens = jnp.array([8], jnp.int32)

    def fwd(p):
        enc = unity.encode_speech(p, cfg, fbank, jnp.array([64]))
        feats = unity.decode_text(p, cfg, ids, enc, self_lengths=lens)
        return unity.project(p, feats)

    ref = np.asarray(fwd(params))
    got = np.asarray(fwd(qparams))
    # logits drift bounded; argmax agreement high
    agree = float(np.mean(ref.argmax(-1) == got.argmax(-1)))
    assert agree >= 0.75, agree
    assert np.max(np.abs(ref - got)) / (np.max(np.abs(ref)) + 1e-9) < 0.2


def test_int8_kv_cache_decode_close():
    """DecoderCacheQ8 (int8 row-quantized KV) must track the bf16/fp cache
    closely through multi-step decode, and beam-search-style greedy argmax
    over tied-projection logits must agree."""
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.ops.transformer import (
        TransformerConfig, decoder_cache_init, transformer_decoder_step,
        transformer_stack_init,
    )

    cfg = TransformerConfig(dim=64, num_layers=3, num_heads=4, ffn_inner_dim=128,
                            vocab_size=100, max_seq_len=64,
                            has_cross_attention=True)
    params = transformer_stack_init(jax.random.PRNGKey(0), cfg)
    enc = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 64))
    c_fp = decoder_cache_init(params, cfg, enc, 8)
    c_q8 = decoder_cache_init(params, cfg, enc, 8, kv_int8=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 64))
    for step in range(6):
        y_fp, c_fp = transformer_decoder_step(params, x, c_fp,
                                              jnp.asarray(step), cfg)
        y_q8, c_q8 = transformer_decoder_step(params, x, c_q8,
                                              jnp.asarray(step), cfg)
        rel = float(jnp.abs(y_fp - y_q8).max() / (jnp.abs(y_fp).max() + 1e-9))
        assert rel < 0.02, (step, rel)
        x = y_fp  # feed the fp trajectory to both caches


# ---------------------------------------------------------------------------
# int4 (group-wise) weight-only quantization
# ---------------------------------------------------------------------------

def test_int4_linear_matches_manual_dequant_exactly():
    """linear_quantized_int4 must equal the explicit dequantize-then-matmul
    composition bit-for-bit at f32 (same contraction order per group)."""
    from seamless_communication_tpu.ops.quantization import (
        linear_quantized_int4, quantize_weight_int4,
    )
    w = jax.random.normal(jax.random.PRNGKey(0), (256, 96)) * 0.02
    q, s = quantize_weight_int4(w, group=128)
    assert q.dtype == jnp.int4 and q.shape == (256, 96)
    assert s.shape == (2, 96)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 256))
    got = linear_quantized_int4({"weight_i4": q, "scale4": s}, x)
    deq = (q.astype(jnp.float32).reshape(2, 128, 96)
           * s[:, None, :]).reshape(256, 96)
    ref = x @ deq
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4 * float(jnp.max(jnp.abs(ref)))


def test_int4_group_quantization_error_bounds():
    """Group-128 int4 absmax on Gaussian weights: per-matmul relative error
    well under 5% (int8's is ~0.5%); ragged in_dim falls back to one group."""
    from seamless_communication_tpu.ops.quantization import (
        linear_quantized_int4, quantize_weight_int4,
    )
    w = jax.random.normal(jax.random.PRNGKey(0), (512, 256)) * 0.02
    q, s = quantize_weight_int4(w)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 512))
    y_ref = x @ w
    y_q = linear_quantized_int4({"weight_i4": q, "scale4": s}, x)
    # absmax 4-bit on GAUSSIAN weights is coarse by construction: the group
    # absmax is ~3.2 sigma, so the lsb is ~0.46 sigma and the per-matmul rms
    # relative error lands ~12-14% (vs ~1% at int8). Real transformer weights
    # fare better (heavy-tailed columns pin the scale; logits are dominated
    # by coherent components) — the e2e argmax-agreement test below is the
    # quality gate; this pins the expected analytic error band.
    rms = float(jnp.sqrt(jnp.mean((y_q - y_ref) ** 2))
                / (jnp.sqrt(jnp.mean(y_ref ** 2)) + 1e-9))
    assert rms < 0.16, rms

    # ragged input dim (200 % 128 != 0): single group, still exact dispatch
    w2 = jax.random.normal(jax.random.PRNGKey(2), (200, 64)) * 0.02
    q2, s2 = quantize_weight_int4(w2)
    assert s2.shape == (1, 64)
    y2 = linear_quantized_int4({"weight_i4": q2, "scale4": s2},
                               jnp.ones((1, 200)))
    assert np.isfinite(np.asarray(y2)).all()


def test_int4_quantize_params_and_linear_dispatch():
    from seamless_communication_tpu.ops.quantization import quantize_params
    key = jax.random.PRNGKey(0)
    params = {"q_proj": linear_init(key, 512, 512)}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 512))
    y_ref = linear(params["q_proj"], x)
    qp = quantize_params(params, bits=4)
    assert "weight_i4" in qp["q_proj"] and "weight" not in qp["q_proj"]
    assert qp["q_proj"]["scale4"].shape == (4, 512)
    y_q = linear(qp["q_proj"], x)
    rms = float(jnp.sqrt(jnp.mean((y_q - y_ref) ** 2))
                / jnp.sqrt(jnp.mean(y_ref ** 2)))
    assert rms < 0.16, rms
    rep = quantization_report(qp)
    assert rep["quantized_weight_bytes"] == 512 * 512 // 2  # packed


def test_int4_stacked_layers():
    from seamless_communication_tpu.ops.quantization import quantize_params
    w = jax.random.normal(jax.random.PRNGKey(0), (3, 256, 256)) * 0.02
    qp = quantize_params({"inner_proj": {"weight": w}}, bits=4)
    assert qp["inner_proj"]["weight_i4"].shape == (3, 256, 256)
    assert qp["inner_proj"]["weight_i4"].dtype == jnp.int4
    assert qp["inner_proj"]["scale4"].shape == (3, 2, 256)


def test_int4_embedding_and_tied_projection():
    """Group-accumulated tied projection == explicit dequant matmul; lookup
    reconstructs rows within int4 tolerance."""
    from seamless_communication_tpu.ops.modules import embedding, embedding_init
    from seamless_communication_tpu.ops.quantization import quantize_params
    from seamless_communication_tpu.ops.transformer import tied_projection
    p = embedding_init(jax.random.PRNGKey(0), 1000, 256)
    qp = quantize_params({"embed": p}, min_size=1024, bits=4)["embed"]
    assert "embedding_i4" in qp and qp["row_scale4"].shape == (1000, 2)
    ids = jnp.asarray([[1, 5, 999]])
    ref = embedding(p, ids, scale=256 ** 0.5)
    got = embedding(qp, ids, scale=256 ** 0.5)
    # the lookup reconstructs each element to within half an int4 lsb
    assert float(jnp.max(jnp.abs(ref - got)) / jnp.max(jnp.abs(ref))) < 0.10

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 256))
    ref = tied_projection(p, x)
    got = tied_projection(qp, x)
    rms = float(jnp.sqrt(jnp.mean((ref - got) ** 2))
                / jnp.sqrt(jnp.mean(ref ** 2)))
    assert rms < 0.16, rms

    # exactness vs the dequantized table (same per-group product order)
    deq = (qp["embedding_i4"].astype(jnp.float32).reshape(1000, 2, 128)
           * qp["row_scale4"][..., None]).reshape(1000, 256)
    exact = sum(
        jnp.matmul(x[..., i * 128:(i + 1) * 128],
                   deq[:, i * 128:(i + 1) * 128].T,
                   preferred_element_type=jnp.float32)
        for i in range(2))
    assert float(jnp.max(jnp.abs(got - exact))) < 1e-3


def test_int4_unity_decode_close_to_fp():
    """End-to-end tiny UnitY text decode with int4 weights: argmax agreement
    stays high (lossier than int8 but structurally sound)."""
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.models.unity.builder import get_arch
    from seamless_communication_tpu.ops.quantization import quantize_params

    cfg = get_arch("tiny_v2")
    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    qparams = quantize_params(params, min_size=1024, bits=4)

    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.standard_normal((1, 64, 80)), jnp.float32)
    ids = jnp.asarray(rng.integers(4, 200, (1, 8)), jnp.int32)
    lens = jnp.array([8], jnp.int32)

    def fwd(p):
        enc = unity.encode_speech(p, cfg, fbank, jnp.array([64]))
        feats = unity.decode_text(p, cfg, ids, enc, self_lengths=lens)
        return unity.project(p, feats)

    ref = np.asarray(fwd(params))
    got = np.asarray(fwd(qparams))
    agree = float(np.mean(ref.argmax(-1) == got.argmax(-1)))
    assert agree >= 0.6, agree
    assert np.isfinite(got).all()


def test_int4_per_column_mode():
    """quantize_params(bits=4, int4_group=0): PER-COLUMN int4 scales — one
    scale group spanning the whole input dim, so every linear stays a single
    int4-operand matmul (the fast serving mode: measured 2.51 vs int8's 2.76
    ms/step on the v2-large beam decode, where group-128's per-group einsums
    measured 3.92 — docs/performance.md). Coarser than group-128: pin the
    error band and that dispatch still goes through the i4 path."""
    from seamless_communication_tpu.ops.modules import linear
    from seamless_communication_tpu.ops.quantization import quantize_params

    w = jax.random.normal(jax.random.PRNGKey(0), (512, 256)) * 0.02
    params = {"inner_proj": {"weight": w}}
    qp = quantize_params(params, bits=4, int4_group=0)
    assert qp["inner_proj"]["weight_i4"].dtype == jnp.int4
    assert qp["inner_proj"]["scale4"].shape == (1, 256)   # one group
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 512))
    y_ref = x @ w
    y_q = linear(qp["inner_proj"], x)
    rms = float(jnp.sqrt(jnp.mean((y_q - y_ref) ** 2))
                / (jnp.sqrt(jnp.mean(y_ref ** 2)) + 1e-9))
    # whole-column absmax at 4 bits: coarser than group-128 but same order on
    # Gaussian weights (the absmax grows only ~sqrt(2 log n) with group size)
    assert rms < 0.2, rms

    # group-128 remains the default
    qp128 = quantize_params(params, bits=4)
    assert qp128["inner_proj"]["scale4"].shape == (4, 256)
