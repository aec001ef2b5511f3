"""Round-trip tests for checkpoint/convert_fairseq2.py on SYNTHETIC .pt files.

No real checkpoints are available in dev, so these tests invert the converter's
layout conventions: export a random-init param pytree to a fairseq2-style torch
state dict (torch layouts: linear (out,in), conv1d (out,in,k), convT (in,out,k),
weight-norm g/v pairs), torch.save it, then run the production loaders
(load_pt_state_dict -> *_tree_from_fairseq2) and require the EXACT original
pytree back — any transposition, key-name, or stacking mistake in the converter
breaks value equality (dims are chosen non-square so transposes can't silently
cancel)."""

import numpy as np
import pytest
import torch

import jax

from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
    load_pt_state_dict, monotonic_tree_from_fairseq2, unity_tree_from_fairseq2,
    vocoder_tree_from_pt,
)
from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig, monotonic_decoder_init,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.vocoder.codehifigan import (
    CodeHifiGanConfig, code_hifigan_init,
)
from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig


def _t(x):
    return torch.from_numpy(np.asarray(x).copy())


# --- exporters: our pytree layout -> fairseq2 torch layout ------------------

def _x_lin(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.asarray(p["weight"]).T)   # (in,out)->(out,in)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _x_ln(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _x_conv(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.transpose(np.asarray(p["weight"]), (2, 1, 0)))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _x_pointwise(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.asarray(p["weight"]).T[:, :, None])


def _x_embed(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(p["embedding"])


def _x_mha(sd, prefix, p):
    for k in ("q_proj", "k_proj", "v_proj", "output_proj"):
        _x_lin(sd, f"{prefix}.{k}", p[k])


def _unstack(stacked):
    n = jax.tree.leaves(stacked)[0].shape[0]
    return [jax.tree.map(lambda x: np.asarray(x)[i], stacked) for i in range(n)]


def _x_encoder(sd, prefix, embed_prefix, tree):
    _x_embed(sd, embed_prefix, tree["embed"])
    for i, lp in enumerate(_unstack(tree["stack"]["layers"])):
        p = f"{prefix}.layers.{i}"
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
        _x_ln(sd, f"{p}.ffn_layer_norm", lp["ffn"]["layer_norm"])
        _x_lin(sd, f"{p}.ffn.inner_proj", lp["ffn"]["inner_proj"])
        _x_lin(sd, f"{p}.ffn.output_proj", lp["ffn"]["output_proj"])
    _x_ln(sd, f"{prefix}.layer_norm", tree["stack"]["layer_norm"])


def _x_decoder(sd, prefix, embed_prefix, tree):
    _x_embed(sd, embed_prefix, tree["embed"])
    for i, lp in enumerate(_unstack(tree["stack"]["layers"])):
        p = f"{prefix}.layers.{i}"
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
        _x_ln(sd, f"{p}.encoder_decoder_attn_layer_norm",
              lp["cross_attn_layer_norm"])
        _x_mha(sd, f"{p}.encoder_decoder_attn", lp["cross_attn"])
        _x_ln(sd, f"{p}.ffn_layer_norm", lp["ffn"]["layer_norm"])
        _x_lin(sd, f"{p}.ffn.inner_proj", lp["ffn"]["inner_proj"])
        _x_lin(sd, f"{p}.ffn.output_proj", lp["ffn"]["output_proj"])
    _x_ln(sd, f"{prefix}.layer_norm", tree["stack"]["layer_norm"])


def export_unity(params: dict) -> dict:
    sd: dict = {}
    se = params["speech_encoder"]
    _x_ln(sd, "speech_encoder_frontend.post_extract_layer_norm",
          se["feature_projection"]["layer_norm"])
    _x_lin(sd, "speech_encoder_frontend.model_dim_proj",
           se["feature_projection"]["projection"])
    for i, lp in enumerate(_unstack(se["encoder"])):
        p = f"speech_encoder.inner.layers.{i}"
        _x_ln(sd, f"{p}.ffn1_layer_norm", lp["ffn1"]["layer_norm"])
        _x_lin(sd, f"{p}.ffn1.inner_proj", lp["ffn1"]["inner_proj"])
        _x_lin(sd, f"{p}.ffn1.output_proj", lp["ffn1"]["output_proj"])
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
        if "rel_k_embed" in lp["self_attn"]:
            _x_embed(sd, f"{p}.self_attn.sdpa.rel_k_embed",
                     lp["self_attn"]["rel_k_embed"])
        if "r_proj" in lp["self_attn"]:
            _x_lin(sd, f"{p}.self_attn.sdpa.r_proj", lp["self_attn"]["r_proj"])
            sd[f"{p}.self_attn.sdpa.u_bias"] = _t(lp["self_attn"]["u_bias"])
            sd[f"{p}.self_attn.sdpa.v_bias"] = _t(lp["self_attn"]["v_bias"])
        conv = lp["conv"]
        _x_ln(sd, f"{p}.conv_layer_norm", conv["layer_norm"])
        _x_pointwise(sd, f"{p}.conv.pointwise_conv1", conv["pointwise_conv1"])
        _x_conv(sd, f"{p}.conv.depthwise_conv", conv["depthwise_conv"])
        _x_ln(sd, f"{p}.conv.layer_norm", conv["norm"])
        _x_pointwise(sd, f"{p}.conv.pointwise_conv2", conv["pointwise_conv2"])
        _x_ln(sd, f"{p}.ffn2_layer_norm", lp["ffn2"]["layer_norm"])
        _x_lin(sd, f"{p}.ffn2.inner_proj", lp["ffn2"]["inner_proj"])
        _x_lin(sd, f"{p}.ffn2.output_proj", lp["ffn2"]["output_proj"])
        _x_ln(sd, f"{p}.layer_norm", lp["layer_norm"])
    _x_lin(sd, "speech_encoder.proj1", se["intermediate_ffn"]["inner_proj"])
    _x_lin(sd, "speech_encoder.proj2", se["intermediate_ffn"]["output_proj"])
    _x_ln(sd, "speech_encoder.layer_norm", se["inner_layer_norm"])
    for i, ap in enumerate(se["adaptor"]):
        p = f"speech_encoder.adaptor_layers.{i}"
        _x_ln(sd, f"{p}.residual_layer_norm", ap["residual_layer_norm"])
        _x_conv(sd, f"{p}.residual_conv", ap["residual_conv"])
        _x_ln(sd, f"{p}.self_attn_layer_norm", ap["self_attn_layer_norm"])
        _x_conv(sd, f"{p}.self_attn_conv", ap["self_attn_conv"])
        _x_mha(sd, f"{p}.self_attn", ap["self_attn"])
        _x_ln(sd, f"{p}.ffn_layer_norm", ap["ffn_layer_norm"])
        _x_lin(sd, f"{p}.ffn.inner_proj", ap["ffn"]["inner_proj"])
        _x_lin(sd, f"{p}.ffn.output_proj", ap["ffn"]["output_proj"])
    _x_decoder(sd, "text_decoder", "text_decoder_frontend.embed",
               params["text_decoder"])
    if "text_encoder" in params:
        _x_encoder(sd, "text_encoder", "text_encoder_frontend.embed",
                   params["text_encoder"])
    if "t2u" in params:
        t2u = params["t2u"]
        _x_encoder(sd, "t2u_model.encoder", "t2u_model.decoder_frontend.embed",
                   {"embed": {"embedding": np.zeros((4, 4), np.float32)},
                    "stack": t2u["encoder"]})
        _x_embed(sd, "t2u_model.decoder_frontend.embed_char", t2u["embed_char"])
        sd["t2u_model.decoder_frontend.pos_emb_alpha"] = _t(t2u["pos_emb_alpha"])
        sd["t2u_model.decoder_frontend.pos_emb_alpha_char"] = _t(
            t2u["pos_emb_alpha_char"])
        vp = "t2u_model.decoder_frontend.variance_adaptor.duration_predictor"
        dp = t2u["duration_predictor"]
        _x_conv(sd, f"{vp}.conv1.0", dp["conv1"])
        _x_ln(sd, f"{vp}.ln1", dp["ln1"])
        _x_conv(sd, f"{vp}.conv2.0", dp["conv2"])
        _x_ln(sd, f"{vp}.ln2", dp["ln2"])
        _x_lin(sd, f"{vp}.proj", dp["proj"])
        for i, lp in enumerate(_unstack(t2u["decoder_layers"])):
            p = f"t2u_model.decoder.layers.{i}"
            _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
            _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
            _x_conv(sd, f"{p}.conv1d.conv1", lp["conv1"])
            _x_conv(sd, f"{p}.conv1d.conv2", lp["conv2"])
            _x_ln(sd, f"{p}.conv1d_layer_norm", lp["conv_layer_norm"])
        _x_ln(sd, "t2u_model.decoder.layer_norm", t2u["layer_norm"])
        _x_lin(sd, "t2u_model.final_proj", t2u["final_proj"])
    return sd


def export_monotonic(params: dict) -> dict:
    sd: dict = {}
    for i, lp in enumerate(_unstack(params["layers"])):
        p = f"text_decoder.layers.{i}"
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
        _x_ln(sd, f"{p}.encoder_decoder_attn_layer_norm",
              lp["cross_attn_layer_norm"])
        _x_mha(sd, f"{p}.encoder_decoder_attn", lp["cross_attn"])
        pc = f"{p}.p_choose_layer"
        sd[f"{pc}.energy_bias"] = _t(lp["p_choose"]["energy_bias"])
        for j, (qp, kp) in enumerate(zip(lp["p_choose"]["q_energy_proj"],
                                         lp["p_choose"]["k_energy_proj"])):
            # fairseq2 EnergyProjection is a Sequential (Linear, ReLU, ...):
            # use stride-2 indices to prove the converter's sorted-index scan
            _x_lin(sd, f"{pc}.q_energy_proj.layers.{2 * j}", qp)
            _x_lin(sd, f"{pc}.k_energy_proj.layers.{2 * j}", kp)
        _x_ln(sd, f"{p}.ffn_layer_norm", lp["ffn"]["layer_norm"])
        _x_lin(sd, f"{p}.ffn.inner_proj", lp["ffn"]["inner_proj"])
        _x_lin(sd, f"{p}.ffn.output_proj", lp["ffn"]["output_proj"])
    _x_ln(sd, "text_decoder.layer_norm", params["layer_norm"])
    sd["final_proj.weight"] = _t(params["embed"]["embedding"])
    return sd


def export_vocoder(params: dict) -> dict:
    sd: dict = {}
    g = "code_generator"

    def conv_wn(prefix, p, transpose=False):
        w = np.asarray(p["weight"])
        w = (np.transpose(w, (1, 2, 0)) if transpose      # (k,in,out)->(in,out,k)
             else np.transpose(w, (2, 1, 0)))             # (k,in,out)->(out,in,k)
        # weight-norm split with g = ||v|| so the fold returns v exactly
        v = w
        gnorm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
        sd[f"{prefix}.weight_g"] = _t(gnorm)
        sd[f"{prefix}.weight_v"] = _t(v)
        if "bias" in p:
            sd[f"{prefix}.bias"] = _t(p["bias"])

    _x_embed(sd, f"{g}.dict", params["unit_embedding"])
    _x_embed(sd, f"{g}.spkr", params["speaker_embedding"])
    _x_embed(sd, f"{g}.lang", params["language_embedding"])
    dp = params["dur_predictor"]
    _x_conv(sd, f"{g}.dur_predictor.conv1.0", dp["conv1"])
    _x_ln(sd, f"{g}.dur_predictor.ln1", dp["ln1"])
    _x_conv(sd, f"{g}.dur_predictor.conv2.0", dp["conv2"])
    _x_ln(sd, f"{g}.dur_predictor.ln2", dp["ln2"])
    _x_lin(sd, f"{g}.dur_predictor.proj", dp["proj"])
    h = params["hifigan"]
    conv_wn(f"{g}.conv_pre", h["conv_pre"])
    for i, up in enumerate(h["upsampler"]):
        conv_wn(f"{g}.ups.{i}", up, transpose=True)
    for i, rb in enumerate(h["resblocks"]):
        for j, c in enumerate(rb["convs1"]):
            conv_wn(f"{g}.resblocks.{i}.convs1.{j}", c)
        for j, c in enumerate(rb["convs2"]):
            conv_wn(f"{g}.resblocks.{i}.convs2.{j}", c)
    conv_wn(f"{g}.conv_post", h["conv_post"])
    return sd


# --- tests -------------------------------------------------------------------

def _assert_trees_equal(expected, got, *, atol=0.0):
    e_flat = jax.tree_util.tree_flatten_with_path(expected)[0]
    g_flat = {jax.tree_util.keystr(p): leaf
              for p, leaf in jax.tree_util.tree_flatten_with_path(got)[0]}
    e_keys = {jax.tree_util.keystr(p) for p, _ in e_flat}
    assert e_keys == set(g_flat), (
        f"missing: {sorted(e_keys - set(g_flat))[:5]} "
        f"extra: {sorted(set(g_flat) - e_keys)[:5]}")
    for p, leaf in e_flat:
        key = jax.tree_util.keystr(p)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(g_flat[key]),
                                   atol=atol, rtol=0, err_msg=key)


def test_unity_pt_roundtrip(tmp_path):
    params = unity.unity_init(jax.random.PRNGKey(0), get_arch("tiny_v2"))
    path = tmp_path / "unity.pt"
    torch.save({"model": export_unity(params)}, path)
    got = unity_tree_from_fairseq2(load_pt_state_dict(str(path)))
    _assert_trees_equal(params, got)


def test_monotonic_pt_roundtrip(tmp_path):
    cfg = MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)
    params = monotonic_decoder_init(jax.random.PRNGKey(1), cfg)
    path = tmp_path / "monotonic.pt"
    torch.save({"model": export_monotonic(params)}, path)
    got = monotonic_tree_from_fairseq2(load_pt_state_dict(str(path)))
    _assert_trees_equal(params, got)


def test_vocoder_pt_roundtrip(tmp_path):
    cfg = CodeHifiGanConfig(
        num_units=100, unit_embed_dim=32, num_langs=4, lang_embed_dim=8,
        num_spkrs=4, spkr_embed_dim=8, dur_predictor_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=48, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)))
    params = code_hifigan_init(jax.random.PRNGKey(2), cfg)
    path = tmp_path / "vocoder.pt"
    torch.save({"generator": export_vocoder(params)}, path)
    got = vocoder_tree_from_pt(load_pt_state_dict(str(path)))
    # weight-norm fold uses sqrt/divide: exact up to one rounding step
    _assert_trees_equal(params, got, atol=1e-6)


def test_apply_unity_fixups():
    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        apply_unity_fixups,
    )
    rng = np.random.default_rng(0)
    embeds = rng.normal(size=(10, 4)).astype(np.float32)
    char = rng.normal(size=(7, 4)).astype(np.float32)
    t2u_proj = rng.normal(size=(5, 4)).astype(np.float32)
    sd = {"final_proj.weight": embeds.copy(),
          "t2u_model.decoder_frontend.embed_char.weight": char.copy(),
          "t2u_model.final_proj.weight": t2u_proj.copy(),
          "t2u_model.decoder_frontend.embed.weight": np.zeros((5, 4), np.float32)}
    # char spm order: pieces "c","a","b" at model rows 4,5,6; dictionary order
    # (sorted) puts a->4, b->5, c->6, so model row i takes old row mapping[i]
    out = apply_unity_fixups(sd, is_nllb_100=False,
                             char_spm_pieces=["<unk>", "<s>", "</s>", "<pad>",
                                              "c", "a", "b"])
    # control-symbol permutation (BOS,PAD,EOS,UNK)->(PAD,UNK,BOS,EOS)
    np.testing.assert_array_equal(out["final_proj.weight"][[0, 1, 2, 3]],
                                  embeds[[1, 3, 0, 2]])
    np.testing.assert_array_equal(out["final_proj.weight"][4:], embeds[4:])
    # tied into both frontends
    np.testing.assert_array_equal(out["text_decoder_frontend.embed.weight"],
                                  out["final_proj.weight"])
    np.testing.assert_array_equal(out["text_encoder_frontend.embed.weight"],
                                  out["final_proj.weight"])
    # char reorder: mapping = [0,1,2,3] + [dict_idx of "c","a","b"] = ...,6,4,5
    got_char = out["t2u_model.decoder_frontend.embed_char.weight"]
    np.testing.assert_array_equal(got_char[4], char[6])
    np.testing.assert_array_equal(got_char[5], char[4])
    np.testing.assert_array_equal(got_char[6], char[5])
    # t2u decoder frontend embed tied to t2u final_proj
    np.testing.assert_array_equal(
        out["t2u_model.decoder_frontend.embed.weight"], t2u_proj)
