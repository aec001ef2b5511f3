"""Parity of ops/conformer.py and ops/attention.py against the HF torch oracles
(checkpoint-validated implementations of the reference semantics, SURVEY.md §2.3)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.common import (
    batch_norm_fold,
    conv1d_from_torch,
    layer_norm_from_torch,
    linear_from_torch,
    mha_from_torch,
    t2j,
)
from tests.conftest import assert_close

from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.conformer import (
    ConformerConfig,
    chunk_attention_bias,
    conformer_encoder,
    conformer_layer,
)

torch.manual_seed(0)

DIM, HEADS, T, B = 64, 4, 19, 2


def _v2_config(**kw):
    from transformers import SeamlessM4Tv2Config
    return SeamlessM4Tv2Config(
        hidden_size=DIM,
        speech_encoder_attention_heads=HEADS,
        speech_encoder_intermediate_size=DIM * 2,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=3,
        speech_encoder_dropout=0.0,
        speech_encoder_hidden_act="swish",
        **kw,
    )


def _v1_config():
    from transformers import SeamlessM4TConfig
    return SeamlessM4TConfig(
        hidden_size=DIM,
        speech_encoder_attention_heads=HEADS,
        speech_encoder_intermediate_size=DIM * 2,
        conv_depthwise_kernel_size=7,
        speech_encoder_dropout=0.0,
        speech_encoder_hidden_act="swish",
        max_source_positions=256,
        position_embeddings_type="relative",
    )


def _conv_params_from_hf(mod, *, v1=False):
    def pw(m):
        # torch Conv1d k=1: weight (out, in, 1) -> linear (in, out)
        w = m.weight.detach().numpy()[:, :, 0].T
        return {"weight": jnp.asarray(w)}
    return {
        "layer_norm": layer_norm_from_torch(mod.layer_norm),
        "pointwise_conv1": pw(mod.pointwise_conv1),
        "depthwise_conv": conv1d_from_torch(mod.depthwise_conv),
        "norm": batch_norm_fold(mod.batch_norm) if v1
        else layer_norm_from_torch(mod.depthwise_layer_norm),
        "pointwise_conv2": pw(mod.pointwise_conv2),
    }


def _ffn_params_from_hf(ln, ffn):
    return {
        "layer_norm": layer_norm_from_torch(ln),
        "inner_proj": linear_from_torch(ffn.intermediate_dense),
        "output_proj": linear_from_torch(ffn.output_dense),
    }


def test_shaw_attention_parity():
    from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
        SeamlessM4Tv2ConformerSelfAttention,
    )
    cfg = _v2_config()
    mod = SeamlessM4Tv2ConformerSelfAttention(cfg).eval()
    x = torch.randn(B, T, DIM)
    with torch.no_grad():
        ref, _ = mod(x)
    params = mha_from_torch(mod.linear_q, mod.linear_k, mod.linear_v, mod.linear_out)
    params["rel_k_embed"] = {"embedding": t2j(mod.distance_embedding.weight)}
    got = attn_ops.shaw_self_attention(params, t2j(x), HEADS, max_left=8, max_right=3)
    assert_close(got, ref.numpy(), atol=2e-5)


def test_xl_attention_parity():
    from transformers.models.seamless_m4t.modeling_seamless_m4t import (
        SeamlessM4TConformerSelfAttention,
        SeamlessM4TConformerRelPositionalEmbedding,
    )
    cfg = _v1_config()
    mod = SeamlessM4TConformerSelfAttention(cfg).eval()
    pos = SeamlessM4TConformerRelPositionalEmbedding(cfg)
    x = torch.randn(B, T, DIM)
    with torch.no_grad():
        rel = pos(x)
        ref, _ = mod(x, relative_position_embeddings=rel)
    params = mha_from_torch(mod.linear_q, mod.linear_k, mod.linear_v, mod.linear_out)
    params["r_proj"] = linear_from_torch(mod.linear_pos)
    params["u_bias"] = t2j(mod.pos_bias_u)
    params["v_bias"] = t2j(mod.pos_bias_v)
    got = attn_ops.xl_self_attention(params, t2j(x), HEADS)
    assert_close(got, ref.numpy(), atol=2e-5)


@pytest.mark.parametrize("version", ["v1", "v2"])
def test_conformer_layer_parity(version):
    if version == "v2":
        from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
            SeamlessM4Tv2ConformerEncoderLayer,
        )
        hf_cfg = _v2_config()
        mod = SeamlessM4Tv2ConformerEncoderLayer(hf_cfg).eval()
        cfg = ConformerConfig(dim=DIM, ffn_inner_dim=DIM * 2, num_heads=HEADS,
                              depthwise_kernel_size=7, pos_type="shaw",
                              causal_depthwise_conv=True, conv_norm="layer_norm",
                              shaw_max_left=8, shaw_max_right=3)
        sa = mha_from_torch(mod.self_attn.linear_q, mod.self_attn.linear_k,
                            mod.self_attn.linear_v, mod.self_attn.linear_out)
        sa["rel_k_embed"] = {"embedding": t2j(mod.self_attn.distance_embedding.weight)}
        conv = _conv_params_from_hf(mod.conv_module)
    else:
        from transformers.models.seamless_m4t.modeling_seamless_m4t import (
            SeamlessM4TConformerEncoderLayer,
            SeamlessM4TConformerRelPositionalEmbedding,
        )
        hf_cfg = _v1_config()
        mod = SeamlessM4TConformerEncoderLayer(hf_cfg).eval()
        cfg = ConformerConfig(dim=DIM, ffn_inner_dim=DIM * 2, num_heads=HEADS,
                              depthwise_kernel_size=7, pos_type="xl",
                              causal_depthwise_conv=False, conv_norm="batch_norm")
        sa = mha_from_torch(mod.self_attn.linear_q, mod.self_attn.linear_k,
                            mod.self_attn.linear_v, mod.self_attn.linear_out)
        sa["r_proj"] = linear_from_torch(mod.self_attn.linear_pos)
        sa["u_bias"] = t2j(mod.self_attn.pos_bias_u)
        sa["v_bias"] = t2j(mod.self_attn.pos_bias_v)
        conv = _conv_params_from_hf(mod.conv_module, v1=True)

    params = {
        "ffn1": _ffn_params_from_hf(mod.ffn1_layer_norm, mod.ffn1),
        "self_attn_layer_norm": layer_norm_from_torch(mod.self_attn_layer_norm),
        "self_attn": sa,
        "conv": conv,
        "ffn2": _ffn_params_from_hf(mod.ffn2_layer_norm, mod.ffn2),
        "layer_norm": layer_norm_from_torch(mod.final_layer_norm),
    }

    x = torch.randn(B, T, DIM)
    with torch.no_grad():
        if version == "v2":
            ref = mod(x)[0]
        else:
            from transformers.models.seamless_m4t.modeling_seamless_m4t import (
                SeamlessM4TConformerRelPositionalEmbedding,
            )
            pos = SeamlessM4TConformerRelPositionalEmbedding(hf_cfg)
            ref = mod(x, relative_position_embeddings=pos(x))[0]

    got = conformer_layer(params, t2j(x), cfg, attn_bias=None, padding_mask=None)
    assert_close(got, ref.numpy(), atol=5e-5)


def test_chunk_attention_bias_matches_hf_mask():
    T_ = 12
    bias = chunk_attention_bias(T_, chunk_size=4, left_chunk_num=1)
    # HF semantics: attend within own chunk plus 1 previous chunk
    chunk = np.arange(T_) // 4
    start = np.maximum(chunk - 1, 0) * 4
    end = (chunk + 1) * 4
    expect_ok = (np.arange(T_)[None, :] >= start[:, None]) & (np.arange(T_)[None, :] < end[:, None])
    np.testing.assert_array_equal(np.asarray(bias) == 0.0, expect_ok)


def test_mha_kv_cache_step_matches_full():
    """Incremental causal self-attention equals full-sequence causal attention."""
    key = jax.random.PRNGKey(1)
    params = attn_ops.mha_init(key, DIM, HEADS)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, DIM))
    from seamless_communication_tpu.ops.masks import causal_mask
    full = attn_ops.multi_head_attention(params, x, x, HEADS,
                                         bias=causal_mask(T)[None, None])
    cache = attn_ops.kv_cache_init(B, HEADS, T, DIM // HEADS, dtype=jnp.float32)
    outs = []
    for t in range(T):
        y, cache = attn_ops.self_attention_step(params, x[:, t:t + 1], cache,
                                                jnp.int32(t), HEADS)
        outs.append(y)
    inc = jnp.concatenate(outs, axis=1)
    assert_close(inc, full, atol=1e-5)
