"""The incremental (chunk-causal) streaming encoder must reproduce the offline
chunked speech encoder EXACTLY on every prefix (models/wav2vec2/incremental.py
vs speech_encoder_forward)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.wav2vec2.encoder import (
    SpeechEncoderConfig, speech_encoder_forward, speech_encoder_init,
)
from seamless_communication_tpu.models.wav2vec2.incremental import (
    speech_encoder_stream_init, speech_encoder_stream_output,
    speech_encoder_stream_step,
)
from seamless_communication_tpu.ops.conformer import ConformerConfig


@pytest.fixture(scope="module")
def setup():
    cfg = SpeechEncoderConfig(
        model_dim=64, feature_dim=160, ffn_inner_dim=128, num_adaptor_heads=4,
        conformer=ConformerConfig(dim=64, ffn_inner_dim=128, num_heads=4,
                                  num_layers=3, depthwise_kernel_size=7,
                                  pos_type="shaw", shaw_max_left=8,
                                  shaw_max_right=3, causal_depthwise_conv=True),
        chunk_size=4, left_chunk_num=-1)
    params = speech_encoder_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    fbank = jnp.asarray(rng.standard_normal((1, 96, 80)), jnp.float32)
    return cfg, params, fbank


def test_incremental_matches_offline(setup):
    cfg, params, fbank = setup
    step = jax.jit(lambda st, fb: speech_encoder_stream_step(params, st, fb, cfg))
    out = jax.jit(lambda st: speech_encoder_stream_output(params, st, cfg))

    state = speech_encoder_stream_init(cfg, batch=1, max_frames=64)
    # feed in uneven (but chunk-aligned) pieces: 16, 32, 24, 24 fbank frames
    # (= 8, 16, 12, 12 stacked frames; chunk_size 4)
    pieces, pos = [16, 32, 24, 24], 0
    for n in pieces:
        state = step(state, fbank[:, pos:pos + n])
        pos += n
        enc_inc, len_inc = out(state)
        enc_off, len_off = speech_encoder_forward(
            params, fbank[:, :pos], jnp.array([pos], jnp.int32), cfg)
        assert int(len_inc[0]) == int(len_off[0])
        S = int(len_off[0])
        np.testing.assert_allclose(np.asarray(enc_inc[0, :S]),
                                   np.asarray(enc_off[0, :S]),
                                   atol=2e-5, rtol=1e-5)


def test_incremental_single_program_all_lengths(setup):
    """One compiled step program serves every prefix length (dynamic n)."""
    cfg, params, fbank = setup
    step = jax.jit(lambda st, fb: speech_encoder_stream_step(params, st, fb, cfg))
    state = speech_encoder_stream_init(cfg, batch=1, max_frames=64)
    for i in range(6):
        state = step(state, fbank[:, 16 * i:16 * (i + 1)])
    assert int(state.n) == 48  # 6 x 8 stacked frames
    compiled = step.lower(state, fbank[:, :16]).compile()
    assert compiled is not None  # same shapes every call -> one executable


def test_incremental_partial_final_block(setup):
    """A zero-padded final block with n_valid must match the offline encode of
    the exact-length prefix."""
    cfg, params, fbank = setup
    state = speech_encoder_stream_init(cfg, batch=1, max_frames=64)
    state = speech_encoder_stream_step(params, state, fbank[:, :48], cfg)
    # final 20 fbank frames = 10 stacked (not a chunk multiple): pad to 32/16
    tail = jnp.zeros((1, 32, 80), jnp.float32).at[:, :20].set(fbank[:, 48:68])
    state = speech_encoder_stream_step(params, state, tail, cfg,
                                       n_valid=jnp.asarray(10, jnp.int32))
    enc_inc, len_inc = speech_encoder_stream_output(params, state, cfg)
    enc_off, len_off = speech_encoder_forward(
        params, fbank[:, :68], jnp.array([68], jnp.int32), cfg)
    assert int(len_inc[0]) == int(len_off[0])
    S = int(len_off[0])
    np.testing.assert_allclose(np.asarray(enc_inc[0, :S]),
                               np.asarray(enc_off[0, :S]), atol=2e-5, rtol=1e-5)
