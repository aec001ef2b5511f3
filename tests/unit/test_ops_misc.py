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
    dur = jnp.asarray([[2, 2, 2]])
    out, total = gaussian_upsample(x, dur, 8, temperature=0.0001)
    assert int(total[0]) == 6
    # with near-zero temperature each output frame picks its segment's feature
    picks = np.asarray(out[0, :6]).argmax(-1)
    assert list(picks) == [0, 0, 1, 1, 2, 2]


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
