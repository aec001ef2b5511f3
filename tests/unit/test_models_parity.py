"""Parity of model-level components vs HF torch oracles (tiny random configs):
upsampling, NAR T2U decoder, full speech encoder (+adapter), HiFi-GAN vocoder."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.common import (
    conv1d_from_torch, embedding_from_torch, layer_norm_from_torch,
    linear_from_torch, mha_from_torch, t2j,
)
from tests.conftest import assert_close

torch.manual_seed(0)

DIM, HEADS = 64, 4


def _v2_cfg(**kw):
    from transformers import SeamlessM4Tv2Config
    base = dict(
        hidden_size=DIM,
        speech_encoder_attention_heads=HEADS,
        speech_encoder_intermediate_size=DIM * 2,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8,
        right_max_position_embeddings=3,
        speech_encoder_dropout=0.0,
        speech_encoder_hidden_act="swish",
        speech_encoder_layers=2,
        adaptor_kernel_size=8,
        adaptor_stride=8,
        adaptor_dropout=0.0,
        num_adapter_layers=1,
        feature_projection_input_dim=160,
        dropout=0.0,
        attention_dropout=0.0,
        activation_dropout=0.0,
        decoder_attention_heads=HEADS,
        decoder_ffn_dim=DIM * 2,
        t2u_decoder_layers=2,
        t2u_decoder_attention_heads=HEADS,
        t2u_decoder_ffn_dim=DIM * 2,
        unit_hifi_gan_vocab_size=112,
        char_vocab_size=60,
        t2u_variance_predictor_embed_dim=DIM,
        t2u_variance_predictor_hidden_dim=32,
        t2u_variance_predictor_kernel_size=3,
        t2u_variance_pred_dropout=0.0,
        pad_token_id=0,
        speech_encoder_chunk_size=None,
        position_embeddings_type="relative_key",
    )
    base.update(kw)
    return SeamlessM4Tv2Config(**base)


def _vp_params(mod):
    return {
        "conv1": conv1d_from_torch(mod.conv1),
        "ln1": layer_norm_from_torch(mod.ln1),
        "conv2": conv1d_from_torch(mod.conv2),
        "ln2": layer_norm_from_torch(mod.ln2),
        "proj": linear_from_torch(mod.proj),
    }


def test_hard_upsample_matches_torch_repeat_interleave():
    from seamless_communication_tpu.ops.upsample import hard_upsample
    x = torch.randn(2, 5, 8)
    dur = torch.tensor([[1, 2, 0, 3, 1], [2, 2, 1, 0, 0]])
    ref = [torch.repeat_interleave(xb, db, dim=0) for xb, db in zip(x, dur)]
    got, total = hard_upsample(t2j(x), jnp.asarray(dur.numpy()), max_out_len=9)
    assert list(np.asarray(total)) == [7, 5]
    for b, r in enumerate(ref):
        assert_close(got[b, :r.shape[0]], r.numpy(), atol=1e-6)
        assert np.all(np.asarray(got[b, r.shape[0]:]) == 0.0)


def test_variance_predictor_parity():
    from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
        SeamlessM4Tv2VariancePredictor,
    )
    from seamless_communication_tpu.models.unity.t2u import variance_predictor
    mod = SeamlessM4Tv2VariancePredictor(DIM, 32, 3, 0.0).eval()
    x = torch.randn(2, 11, DIM)
    mask = torch.ones(2, 11, dtype=torch.bool)
    mask[1, 7:] = False
    with torch.no_grad():
        ref = mod(x, padding_mask=mask)
    got = variance_predictor(_vp_params(mod), t2j(x), jnp.asarray(mask.numpy()))
    # compare only valid positions (HF's same-pad conv sees zeros beyond — identical)
    assert_close(got, ref.numpy(), atol=2e-5)


def test_nar_t2u_decoder_parity():
    from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
        SeamlessM4Tv2TextToUnitDecoder,
    )
    from seamless_communication_tpu.models.unity.t2u import NarT2UConfig, nar_t2u_decode

    import copy
    hf_cfg = _v2_cfg()
    # HF maps t2u_* config fields onto the generic names for the t2u submodel
    hf_cfg = copy.deepcopy(hf_cfg)
    for param, val in hf_cfg.to_dict().items():
        if param.startswith("t2u_"):
            setattr(hf_cfg, param[4:], val)
    mod = SeamlessM4Tv2TextToUnitDecoder(hf_cfg).eval()

    cfg = NarT2UConfig(model_dim=DIM, num_decoder_layers=2, num_heads=HEADS,
                       ffn_inner_dim=DIM * 2, unit_vocab_size=112, char_vocab_size=60,
                       conv_kernel_size=7, dur_predictor_hidden=32,
                       dur_predictor_kernel=3, pos_pad_idx=1)

    layers = []
    for lyr in mod.layers:
        layers.append({
            "self_attn": mha_from_torch(lyr.self_attn.q_proj, lyr.self_attn.k_proj,
                                        lyr.self_attn.v_proj, lyr.self_attn.out_proj),
            "self_attn_layer_norm": layer_norm_from_torch(lyr.self_attn_layer_norm),
            "conv1": conv1d_from_torch(lyr.conv1),
            "conv2": conv1d_from_torch(lyr.conv2),
            "conv_layer_norm": layer_norm_from_torch(lyr.conv_layer_norm),
        })
    params = {
        "embed_char": embedding_from_torch(mod.embed_char),
        "pos_emb_alpha_char": t2j(mod.pos_emb_alpha_char),
        "pos_emb_alpha": t2j(mod.pos_emb_alpha),
        "duration_predictor": _vp_params(mod.duration_predictor),
        "decoder_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "layer_norm": layer_norm_from_torch(mod.layer_norm),
    }

    B, T, C = 1, 6, 14
    enc = torch.randn(B, T, DIM)
    char_counts = torch.tensor([[3, 2, 4, 2, 2, 1]])
    char_ids = torch.randint(4, 60, (B, C))
    with torch.no_grad():
        ref = mod(char_input_ids=char_ids, char_count_per_id=char_counts,
                  encoder_hidden_states=enc)
    ref_h = ref.last_hidden_state

    # my decode (no final unit projection in HF decoder -> compare hidden states)
    cfg_np = cfg._replace(unit_vocab_size=DIM)  # unused proj
    import seamless_communication_tpu.models.unity.t2u as t2u_mod
    # run pieces: replicate nar_t2u_decode minus final_proj
    from seamless_communication_tpu.ops.masks import lengths_to_padding_mask, padding_bias
    from seamless_communication_tpu.ops.modules import embedding, layer_norm
    from seamless_communication_tpu.ops.upsample import hard_upsample

    encj = t2j(enc)
    char_hidden, char_total = hard_upsample(encj, jnp.asarray(char_counts.numpy()), C)
    char_mask = lengths_to_padding_mask(char_total, C)
    char_emb = embedding(params["embed_char"], jnp.asarray(char_ids.numpy()),
                         scale=DIM ** 0.5)
    char_hidden = t2u_mod._alpha_sin_pos(char_hidden, params["pos_emb_alpha_char"],
                                         1) + char_emb
    log_dur = t2u_mod.variance_predictor(params["duration_predictor"], char_hidden,
                                         char_mask)
    dur = t2u_mod.durations_from_log(log_dur, char_mask)
    U = int(ref_h.shape[1])
    x, unit_total = hard_upsample(char_hidden, dur, U)
    x = t2u_mod._alpha_sin_pos(x, params["pos_emb_alpha"], 1)
    unit_mask = lengths_to_padding_mask(unit_total, U)
    bias = padding_bias(unit_mask)

    def body(h, layer_p):
        return t2u_mod.fft_layer(layer_p, h, bias, unit_mask, cfg), None

    x, _ = jax.lax.scan(body, x, params["decoder_layers"])
    x = layer_norm(params["layer_norm"], x)

    assert int(unit_total[0]) == int(ref_h.shape[1])
    assert_close(x, ref_h.numpy(), atol=5e-4, rtol=1e-3)


def test_speech_encoder_parity():
    from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
        SeamlessM4Tv2SpeechEncoder,
    )
    from seamless_communication_tpu.models.wav2vec2.encoder import (
        SpeechEncoderConfig, speech_encoder_forward,
    )
    from seamless_communication_tpu.ops.conformer import ConformerConfig

    hf_cfg = _v2_cfg(add_adapter=True)
    mod = SeamlessM4Tv2SpeechEncoder(hf_cfg).eval()

    cfg = SpeechEncoderConfig(
        model_dim=DIM, feature_dim=160, ffn_inner_dim=DIM * 2, num_adaptor_heads=HEADS,
        adaptor_kernel_size=8, adaptor_stride=8,
        conformer=ConformerConfig(dim=DIM, ffn_inner_dim=DIM * 2, num_heads=HEADS,
                                  num_layers=2, depthwise_kernel_size=7,
                                  pos_type="shaw", shaw_max_left=8, shaw_max_right=3))

    def ffn_p(ffn):
        return {"inner_proj": linear_from_torch(ffn.intermediate_dense),
                "output_proj": linear_from_torch(ffn.output_dense)}

    def pw(m):
        return {"weight": jnp.asarray(m.weight.detach().numpy()[:, :, 0].T)}

    layers = []
    for lyr in mod.encoder.layers:
        sa = mha_from_torch(lyr.self_attn.linear_q, lyr.self_attn.linear_k,
                            lyr.self_attn.linear_v, lyr.self_attn.linear_out)
        sa["rel_k_embed"] = {"embedding": t2j(lyr.self_attn.distance_embedding.weight)}
        layers.append({
            "ffn1": {"layer_norm": layer_norm_from_torch(lyr.ffn1_layer_norm),
                     **ffn_p(lyr.ffn1)},
            "self_attn_layer_norm": layer_norm_from_torch(lyr.self_attn_layer_norm),
            "self_attn": sa,
            "conv": {
                "layer_norm": layer_norm_from_torch(lyr.conv_module.layer_norm),
                "pointwise_conv1": pw(lyr.conv_module.pointwise_conv1),
                "depthwise_conv": conv1d_from_torch(lyr.conv_module.depthwise_conv),
                "norm": layer_norm_from_torch(lyr.conv_module.depthwise_layer_norm),
                "pointwise_conv2": pw(lyr.conv_module.pointwise_conv2),
            },
            "ffn2": {"layer_norm": layer_norm_from_torch(lyr.ffn2_layer_norm),
                     **ffn_p(lyr.ffn2)},
            "layer_norm": layer_norm_from_torch(lyr.final_layer_norm),
        })

    adap = mod.adapter.layers[0]
    params = {
        "feature_projection": {
            "layer_norm": layer_norm_from_torch(mod.feature_projection.layer_norm),
            "projection": linear_from_torch(mod.feature_projection.projection),
        },
        "encoder": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "intermediate_ffn": ffn_p(mod.intermediate_ffn),
        "inner_layer_norm": layer_norm_from_torch(mod.inner_layer_norm),
        "adaptor": [{
            "residual_layer_norm": layer_norm_from_torch(adap.residual_layer_norm),
            "residual_conv": conv1d_from_torch(adap.residual_conv),
            "self_attn_layer_norm": layer_norm_from_torch(adap.self_attn_layer_norm),
            "self_attn_conv": conv1d_from_torch(adap.self_attn_conv),
            "self_attn": mha_from_torch(adap.self_attn.linear_q, adap.self_attn.linear_k,
                                        adap.self_attn.linear_v, adap.self_attn.linear_out),
            "ffn_layer_norm": layer_norm_from_torch(adap.ffn_layer_norm),
            "ffn": ffn_p(adap.ffn),
        }],
    }

    B, T = 1, 32  # stacked-fbank frames
    feats = torch.randn(B, T, 160)
    with torch.no_grad():
        ref = mod(input_features=feats).last_hidden_state

    # my forward takes raw 80-mel (T*2, 80); un-stack to feed equivalently
    fbank = t2j(feats).reshape(B, T * 2, 80)
    got, lens = speech_encoder_forward(params, fbank, jnp.array([T * 2]), cfg)
    assert got.shape[1] >= ref.shape[1]
    assert_close(got[:, :ref.shape[1]], ref.numpy(), atol=2e-3, rtol=1e-3)


def test_hifigan_parity():
    from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
        SeamlessM4Tv2HifiGan,
    )
    from seamless_communication_tpu.models.vocoder.hifigan import (
        HifiGanConfig, hifigan_forward, hifigan_init,
    )
    hf_cfg = _v2_cfg(unit_embed_dim=32, lang_embed_dim=8, spkr_embed_dim=8,
                     upsample_initial_channel=64,
                     upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
                     resblock_kernel_sizes=[3, 5], resblock_dilation_sizes=[[1, 2], [1, 2]],
                     leaky_relu_slope=0.1)
    mod = SeamlessM4Tv2HifiGan(hf_cfg).eval()
    cfg = HifiGanConfig(model_in_dim=48, upsample_initial_channel=64,
                        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                        resblock_kernel_sizes=(3, 5),
                        resblock_dilation_sizes=((1, 2), (1, 2)))

    params = {
        "conv_pre": conv1d_from_torch(mod.conv_pre),
        "upsampler": [],
        "resblocks": [],
        "conv_post": conv1d_from_torch(mod.conv_post),
    }
    for up in mod.upsampler:
        w = up.weight.detach().numpy()          # (in, out, k) for ConvTranspose1d
        params["upsampler"].append({
            "weight": jnp.asarray(np.transpose(w, (2, 0, 1))),
            "bias": t2j(up.bias),
        })
    for rb in mod.resblocks:
        params["resblocks"].append({
            "convs1": [conv1d_from_torch(c) for c in rb.convs1],
            "convs2": [conv1d_from_torch(c) for c in rb.convs2],
        })

    x = torch.randn(2, 48, 20)  # HF layout (B, C, T)
    with torch.no_grad():
        ref = mod(x)
    got = hifigan_forward(params, t2j(x.transpose(1, 2)), cfg)
    assert got.shape == tuple(ref.shape)
    assert_close(got, ref.numpy(), atol=2e-4, rtol=1e-2)


# ---------------------------------------------------------------------------
# PRETSSEL component oracles (no fairseq2 in env; the pieces the reference
# composes from torch.nn primitives are verified against torch directly)
# ---------------------------------------------------------------------------

def test_conv_transpose_output_padding_parity():
    """PRETSSEL upsampler: ConvTranspose1d(k=2u, stride=u, padding=(k-u)//2+u%2,
    output_padding=u%2) (reference generator/vocoder.py:407-421)."""
    from seamless_communication_tpu.ops.modules import conv_transpose1d
    for u in (5, 2):
        k = 2 * u
        op = u % 2
        pad = (k - u) // 2 + op
        m = torch.nn.ConvTranspose1d(6, 4, k, u, padding=pad, output_padding=op)
        x = torch.randn(2, 6, 13)
        with torch.no_grad():
            ref = m(x)
        p = {"weight": t2j(m.weight.permute(2, 0, 1)),   # (in,out,k)->(k,in,out)
             "bias": t2j(m.bias)}
        got = conv_transpose1d(p, t2j(x.permute(0, 2, 1)), stride=u,
                               padding=pad, output_padding=op)
        assert got.shape[1] == ref.shape[2] == 13 * u
        assert_close(got, ref.permute(0, 2, 1).numpy(), atol=1e-5)


def test_streamable_lstm_parity():
    """StreamableLSTM: torch 2-layer LSTM + skip (reference streamable.py:350-373),
    with the two torch biases folded into one at conversion."""
    from seamless_communication_tpu.models.pretssel.streamable import lstm_forward
    dim, layers = 8, 2
    m = torch.nn.LSTM(dim, dim, layers)
    x = torch.randn(5, 2, dim)      # (T, B, C)
    with torch.no_grad():
        y, _ = m(x)
        ref = (y + x).permute(1, 0, 2)
    tree = []
    for k in range(layers):
        tree.append({
            "wx": {"weight": t2j(getattr(m, f"weight_ih_l{k}").T),
                   "bias": t2j(getattr(m, f"bias_ih_l{k}")
                               + getattr(m, f"bias_hh_l{k}"))},
            "wh": {"weight": t2j(getattr(m, f"weight_hh_l{k}").T)},
        })
    got = lstm_forward(tree, t2j(x.permute(1, 0, 2)))
    assert_close(got, ref.numpy(), atol=1e-5)


def test_postnet_batchnorm_fold_parity():
    """PostNet layer = Conv1d + BatchNorm1d(eval) + Tanh (reference
    generator/vocoder.py:365-385); inference BN folds to a per-channel affine."""
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        _bn_fold, _conv_w,
    )
    from seamless_communication_tpu.ops.modules import conv1d
    conv = torch.nn.Conv1d(8, 12, 5, padding="same")
    bn = torch.nn.BatchNorm1d(12).eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.randn(12) * 0.3)
        bn.running_var.copy_(torch.rand(12) + 0.5)
        bn.weight.copy_(torch.randn(12))
        bn.bias.copy_(torch.randn(12))
        x = torch.randn(2, 8, 17)
        ref = torch.tanh(bn(conv(x))).permute(0, 2, 1)
    sd = {"bn.weight": bn.weight.detach().numpy(),
          "bn.bias": bn.bias.detach().numpy(),
          "bn.running_mean": bn.running_mean.numpy(),
          "bn.running_var": bn.running_var.numpy()}
    aff = _bn_fold(sd, "bn")
    p = {"weight": _conv_w(conv.weight.detach().numpy()),
         "bias": conv.bias.detach().numpy()}
    h = conv1d(p, t2j(x.permute(0, 2, 1)), padding="SAME")
    got = jnp.tanh(h * aff["scale"] + aff["bias"])
    assert_close(got, ref.numpy(), atol=1e-5)
