"""Coverage for remaining small ops: positional ids, masks, gaussian upsample,
LSTM scan, detokenizer hold-back, myle LR, label-smoothed loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_padded_position_ids():
    from seamless_communication_tpu.ops.positional import padded_position_ids
    ids = jnp.asarray([[5, 6, 7, 0, 0]])   # pad=0
    pos = padded_position_ids(ids, padding_idx=0)
    assert list(np.asarray(pos[0])) == [1, 2, 3, 0, 0]


def test_masks():
    from seamless_communication_tpu.ops.masks import (
        causal_mask, lengths_to_padding_mask, mask_to_lengths,
    )
    m = lengths_to_padding_mask(jnp.asarray([2, 4]), 5)
    assert list(np.asarray(mask_to_lengths(m))) == [2, 4]
    cm = np.asarray(causal_mask(3))
    assert cm[0, 1] < -1e8 and cm[2, 0] == 0.0


def test_gaussian_upsample_mass():
    from seamless_communication_tpu.ops.upsample import gaussian_upsample
    x = jnp.eye(3, dtype=jnp.float32)[None]            # 3 one-hot features
    dur = jnp.asarray([[1, 2, 3]])
    out, total = gaussian_upsample(x, dur, 8, delta=100.0)
    assert int(total[0]) == 6
    # sharp delta: each 0-based output frame picks the nearest duration
    # midpoint c = cumsum(d) - d/2 (reference length_regulator.py:85)
    picks = np.asarray(out[0, :6]).argmax(-1)
    assert list(picks) == [0, 0, 1, 1, 2, 2]


def test_gaussian_upsample_zero_duration_still_attended():
    # the reference masks by the SOURCE padding mask, not by duration — a
    # valid position with duration 0 (the expressive EOS unit) receives weight
    from seamless_communication_tpu.ops.upsample import gaussian_upsample
    x = jnp.eye(3, dtype=jnp.float32)[None]
    dur = jnp.asarray([[2, 2, 0]])
    mask = jnp.asarray([[True, True, True]])
    out, total = gaussian_upsample(x, dur, 6, delta=0.1, src_mask=mask)
    assert int(total[0]) == 4
    # zero-duration center sits at cumsum=4; the last frame (t=3) is nearer to
    # it than to c1=3 by |3-4|=1 vs |3-3|=0 -> still some mass on feature 2
    assert float(out[0, 3, 2]) > 0.01
    # with the default durations>0 mask the zero-duration row gets nothing
    out2, _ = gaussian_upsample(x, dur, 6, delta=0.1)
    assert float(out2[0, 3, 2]) == 0.0


def test_lstm_skip_connection():
    from seamless_communication_tpu.models.pretssel.streamable import (
        lstm_forward, lstm_init,
    )
    layers = lstm_init(jax.random.PRNGKey(0), 8, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    y = lstm_forward(layers, x)
    assert y.shape == x.shape
    # skip connection: zero-weights LSTM still passes x through plus tanh-ish term
    assert float(jnp.max(jnp.abs(y))) > 0
    assert lstm_forward([], x) is x                    # no layers = identity


def test_detokenizer_holds_partial_words():
    from seamless_communication_tpu.streaming.agents.detokenizer import (
        DetokenizerAgent,
    )
    from seamless_communication_tpu.streaming.agents.common import TextSegment
    agent = DetokenizerAgent(detokenize_only=False)
    agent.push(TextSegment(content="▁hel"))
    out = agent.pop()
    assert out.is_empty                                # partial word held back
    agent.push(TextSegment(content="lo▁wor"))
    out = agent.pop()
    assert out.content == "hello"
    agent.push(TextSegment(content="ld", finished=True))
    out = agent.pop()
    assert "world" in out.content.replace("▁", "") and out.finished


def test_myle_lr_shape():
    from seamless_communication_tpu.train.lr import myle_lr
    sched = myle_lr(1e-4, warmup_steps=100)
    assert float(sched(50)) == pytest.approx(0.5e-4)
    assert float(sched(100)) == pytest.approx(1e-4)
    assert float(sched(400)) == pytest.approx(0.5e-4)  # 1e-4 * sqrt(100/400)


def test_label_smoothed_loss_ignores_pad():
    from seamless_communication_tpu.train.loss import label_smoothed_nll_loss
    logits = jnp.zeros((1, 4, 8))
    targets = jnp.asarray([[2, 3, 0, 0]])              # pad=0
    loss, n = label_smoothed_nll_loss(logits, targets, pad_idx=0,
                                      label_smoothing=0.1)
    assert int(n) == 2
    # uniform logits: loss per token = log(8) regardless of smoothing
    assert float(loss) == pytest.approx(2 * np.log(8), rel=1e-5)


def test_kv_cache_int8_resolution():
    """SequenceGeneratorOptions.kv_cache_int8=None resolves per-backend (int8
    on TPU — the benched serving config — fp elsewhere); explicit values win."""
    from seamless_communication_tpu.inference.generator import (
        SequenceGeneratorOptions, _resolve_kv_int8,
    )
    import jax

    assert _resolve_kv_int8(SequenceGeneratorOptions(kv_cache_int8=True)) is True
    assert _resolve_kv_int8(SequenceGeneratorOptions(kv_cache_int8=False)) is False
    auto = _resolve_kv_int8(SequenceGeneratorOptions())
    assert auto == (jax.default_backend() == "tpu")


def test_monotonic_parallel_prefill_matches_sequential():
    """Teacher-forced full-sequence prefill == sequential per-token scan on the
    valid region (same logits/p_choose/features/cache rows) — the streaming
    chunk's O(ctx)->O(1) weight-pass optimization must be exact
    (models/monotonic/model.py monotonic_prefill_parallel)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig, monotonic_decoder_cache, monotonic_decoder_init,
        monotonic_prefill, monotonic_prefill_parallel,
    )

    cfg = MonotonicDecoderConfig(model_dim=32, num_layers=3, num_heads=4,
                                 ffn_inner_dim=64, vocab_size=60,
                                 pre_decision_ratio=2)
    params = monotonic_decoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, T, S, MAXLEN = 2, 9, 12, 24
    enc = jnp.asarray(rng.standard_normal((B, S, 32)), jnp.float32)
    enc_mask = jnp.asarray(np.array([[True] * S, [True] * 8 + [False] * 4]))
    tokens = jnp.asarray(rng.integers(4, 60, (B, T)), jnp.int32)
    n_tokens = jnp.asarray(7, jnp.int32)

    cache0 = monotonic_decoder_cache(params, cfg, enc, MAXLEN)
    l1, f1, p1, c1 = monotonic_prefill(params, tokens, n_tokens, cache0, cfg,
                                       enc_padding_mask=enc_mask)
    l2, f2, p2, c2 = monotonic_prefill_parallel(params, tokens, n_tokens,
                                                cache0, cfg,
                                                enc_padding_mask=enc_mask)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=2e-5,
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5,
                               rtol=2e-5)
    n = int(n_tokens)
    np.testing.assert_allclose(np.asarray(f1[:, :n]), np.asarray(f2[:, :n]),
                               atol=2e-5, rtol=2e-5)
    # cache rows [0, n) must match (rows >= n are garbage in both variants)
    np.testing.assert_allclose(np.asarray(c1.self_k[:, :, :, :n]),
                               np.asarray(c2.self_k[:, :, :, :n]),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(c1.self_v[:, :, :, :n]),
                               np.asarray(c2.self_v[:, :, :, :n]),
                               atol=2e-5, rtol=2e-5)


def test_xl_rel_bias_factorization_matches_table_gather():
    """The sinusoid-addition-formula bias == the rel-table+skew formulation.

    Guards the factorized `_xl_rel_bias` (no gather, two MXU matmuls) against
    the definitional route: project xl_rel_table, einsum, select d = i - j."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from seamless_communication_tpu.ops.attention import (
        _xl_rel_bias, xl_rel_table,
    )

    rng = np.random.default_rng(7)
    T, D, H = 33, 32, 4
    dh = D // H
    qv = jnp.asarray(rng.standard_normal((2, H, T, dh)), jnp.float32)
    w_r = jnp.asarray(rng.standard_normal((D, D)) * 0.2, jnp.float32)

    rel = xl_rel_table(T, D)
    r = (rel @ w_r).reshape(2 * T - 1, H, dh).transpose(1, 0, 2)
    bd_full = jnp.einsum("bhqd,hmd->bhqm", qv, r)
    m_idx = (T - 1) - (jnp.arange(T)[:, None] - jnp.arange(T)[None, :])
    want = jnp.take_along_axis(bd_full, m_idx[None, None], axis=-1)

    got = _xl_rel_bias(qv, w_r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
