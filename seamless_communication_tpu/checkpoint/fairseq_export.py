"""Synthetic fairseq-keyed checkpoint EXPORTERS (test/selftest infrastructure).

These invert checkpoint/convert_fairseq2.py's layout conventions: given one of
our random-init param pytrees, emit a fairseq2/fairseq1-style torch state dict
(torch layouts: linear (out,in), conv1d (out,in,k), convT (in,out,k),
weight-norm g/v pairs, Sequential index keys) that the production loaders
round-trip back to the exact original tree. Consumed by
tests/unit/test_fairseq2_convert.py (round-trip equality) and by
scripts/validate_real_checkpoints.py --selftest (generates a full synthetic
checkpoint directory so the harness's loading/wiring/anchor plumbing executes
in CI; the real golden anchors still need real weights).

No production code imports this module; it requires torch.
"""

from __future__ import annotations

import numpy as np
import torch

import jax


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


def _x_convT(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.transpose(np.asarray(p["weight"]), (1, 2, 0)))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _x_film(sd, prefix, p):
    _x_lin(sd, f"{prefix}.proj", p["proj"])
    sd[f"{prefix}.s_gamma"] = _t(p["s_gamma"])
    sd[f"{prefix}.s_beta"] = _t(p["s_beta"])


def _x_bn_identity(sd, prefix, p):
    """Emit BatchNorm1d keys whose _bn_fold result equals the affine {scale,bias}
    exactly: running_var = 1 - eps so sqrt(var + 1e-5) == 1."""
    scale = np.asarray(p["scale"])
    sd[f"{prefix}.weight"] = _t(scale)
    sd[f"{prefix}.bias"] = _t(p["bias"])
    sd[f"{prefix}.running_mean"] = _t(np.zeros_like(scale))
    sd[f"{prefix}.running_var"] = _t(np.full_like(scale, 1.0 - 1e-5))


def _x_wn(sd, prefix, p, *, transpose=False):
    """weight-norm g/v split with g = ||v|| so the fold returns v exactly."""
    w = np.asarray(p["weight"])
    w = (np.transpose(w, (1, 2, 0)) if transpose      # (k,in,out)->(in,out,k)
         else np.transpose(w, (2, 1, 0)))             # (k,in,out)->(out,in,k)
    gnorm = np.sqrt((w ** 2).sum(axis=tuple(range(1, w.ndim)), keepdims=True))
    sd[f"{prefix}.weight_g"] = _t(gnorm)
    sd[f"{prefix}.weight_v"] = _t(w)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _x_lstm(sd, prefix, layers):
    for k, lp in enumerate(layers):
        sd[f"{prefix}.weight_ih_l{k}"] = _t(np.asarray(lp["wx"]["weight"]).T)
        sd[f"{prefix}.weight_hh_l{k}"] = _t(np.asarray(lp["wh"]["weight"]).T)
        # converter folds bias_ih + bias_hh; split in exact halves to prove the sum
        b = np.asarray(lp["wx"]["bias"])
        sd[f"{prefix}.bias_ih_l{k}"] = _t(b * 0.5)
        sd[f"{prefix}.bias_hh_l{k}"] = _t(b * 0.5)


def export_ecapa(sd, prefix, tree):
    def tdnn(p, t):
        _x_conv(sd, f"{p}.conv", t["conv"])
        _x_ln(sd, f"{p}.norm", t["norm"])

    tdnn(f"{prefix}.blocks.0", tree["blocks"][0])
    for i, b in enumerate(tree["blocks"][1:], start=1):
        p = f"{prefix}.blocks.{i}"
        tdnn(f"{p}.tdnn1", b["tdnn1"])
        for j, rb in enumerate(b["res2net"]["blocks"]):
            tdnn(f"{p}.res2net_block.blocks.{j}", rb)
        tdnn(f"{p}.tdnn2", b["tdnn2"])
        _x_conv(sd, f"{p}.se_block.conv1", b["se"]["conv1"])
        _x_conv(sd, f"{p}.se_block.conv2", b["se"]["conv2"])
        if "shortcut" in b:
            _x_conv(sd, f"{p}.shortcut", b["shortcut"])
    tdnn(f"{prefix}.mfa", tree["mfa"])
    tdnn(f"{prefix}.asp.tdnn", tree["asp_tdnn"])
    _x_conv(sd, f"{prefix}.asp.conv", tree["asp_conv"])
    _x_ln(sd, f"{prefix}.asp_norm", tree["asp_norm"])
    _x_conv(sd, f"{prefix}.fc", tree["fc"])


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


def export_unity(params: dict, *, conv_batch_norm: bool = False) -> dict:
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
        if conv_batch_norm:
            _x_bn_identity(sd, f"{p}.conv.batch_norm", conv["norm"])
        else:
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
    if "prosody_encoder" in params:
        export_ecapa(sd, "prosody_encoder_model", params["prosody_encoder"])
    if "t2u" in params and "embed_char" not in params["t2u"]:
        # AR T2U (v1): plain enc-dec over the unit vocab
        t2u = params["t2u"]
        _x_decoder(sd, "t2u_model.decoder", "t2u_model.decoder_frontend.embed",
                   {"embed": t2u["embed"], "stack": t2u["decoder"]})
        if "encoder" in t2u:
            _x_encoder(sd, "t2u_model.encoder", "__tmp_embed",
                       {"embed": {"embedding": np.zeros((1, 1), np.float32)},
                        "stack": t2u["encoder"]})
            del sd["__tmp_embed.weight"]
    elif "t2u" in params:
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
        if "film" in dp:
            _x_film(sd, f"{vp}.film", dp["film"])
        if "prosody_proj" in t2u:
            _x_lin(sd, "t2u_model.prosody_proj", t2u["prosody_proj"])
        for i, lp in enumerate(_unstack(t2u["decoder_layers"])):
            p = f"t2u_model.decoder.layers.{i}"
            _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
            _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
            _x_conv(sd, f"{p}.conv1d.conv1", lp["conv1"])
            _x_conv(sd, f"{p}.conv1d.conv2", lp["conv2"])
            _x_ln(sd, f"{p}.conv1d_layer_norm", lp["conv_layer_norm"])
            if "film" in lp:
                _x_film(sd, f"{p}.film", lp["film"])
        _x_ln(sd, "t2u_model.decoder.layer_norm", t2u["layer_norm"])
        _x_lin(sd, "t2u_model.final_proj", t2u["final_proj"])
    return sd


def export_pretssel(params: dict, cfg) -> dict:
    """Mirror the reference PretsselVocoder layer assembly INDEPENDENTLY of the
    converter's index arithmetic (generator/vocoder.py:221-453): build the
    stream_layers list in construction order, then interleave postnet / chunks /
    conv_pre / ups / resblocks / conv_post exactly as __init__ does."""
    sd: dict = {}
    export_ecapa(sd, "encoder_frontend.prosody_encoder", params["prosody_encoder"])
    _x_embed(sd, "encoder_frontend.embed_tokens", params["embed_tokens"])
    _x_embed(sd, "encoder_frontend.embed_lang", params["embed_lang"])
    sd["encoder_frontend.pos_emb_alpha"] = _t(params["pos_emb_alpha_enc"])
    sd["decoder_frontend.pos_emb_alpha"] = _t(params["pos_emb_alpha_dec"])
    # norm_order POST: the reference PRETSSEL FFT stacks carry NO final
    # layer_norm (generator/builder.py:304)
    for name, layers in (("encoder", params["encoder_layers"]),
                         ("decoder", params["decoder_layers"])):
        for i, lp in enumerate(layers):
            p = f"{name}.layers.{i}"
            _x_mha(sd, f"{p}.self_attn", lp["self_attn"])
            _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
            _x_conv(sd, f"{p}.conv1d.conv1", lp["conv1"])
            _x_conv(sd, f"{p}.conv1d.conv2", lp["conv2"])
            _x_ln(sd, f"{p}.conv1d_layer_norm", lp["conv_layer_norm"])
            _x_film(sd, f"{p}.film", lp["film"])
    # variance adaptor: pitch/vuv/energy predictors + 1x1-conv embeds (no
    # duration predictor — reference generator/builder.py:392-403)
    va = "decoder_frontend.variance_adaptor"
    for name in ("pitch_predictor", "vuv_predictor", "energy_predictor"):
        vp, dp = f"{va}.{name}", params[name]
        _x_conv(sd, f"{vp}.conv1.0", dp["conv1"])
        _x_ln(sd, f"{vp}.ln1", dp["ln1"])
        _x_conv(sd, f"{vp}.conv2.0", dp["conv2"])
        _x_ln(sd, f"{vp}.ln2", dp["ln2"])
        _x_lin(sd, f"{vp}.proj", dp["proj"])
        _x_film(sd, f"{vp}.film", dp["film"])
    _x_conv(sd, f"{va}.embed_pitch", params["embed_pitch"])
    _x_conv(sd, f"{va}.embed_energy", params["embed_energy"])
    _x_lin(sd, "final_proj", params["final_proj"])
    sd["mean"] = _t(params["mean"])
    sd["scale"] = _t(params["scale"])

    # stream_layers in reference construction order (vocoder.py:221-357)
    sea = params["seanet"]
    stream: list = [("conv", sea["enc_in"])]
    for blk in sea["enc_blocks"]:
        stream += [("res", blk["res"]), ("elu", None), ("conv", blk["down"])]
    stream += [("lstm", sea["enc_lstm"]), ("elu", None), ("conv", sea["enc_out"]),
               ("conv", sea["dec_in"]), ("lstm", sea["dec_lstm"])]
    for blk in sea["dec_blocks"]:
        stream += [("elu", None), ("convtr", blk["up"]), ("res", blk["res"])]
    stream += [("elu", None), ("conv", sea["dec_out"])]
    chunk = len(stream) // 4

    hifi = params["hifigan"]
    flat: list = [("postnet", p) for p in params["postnet"]]
    flat += stream[:chunk]
    flat += [("wnconv", hifi["conv_pre"])]
    flat += stream[chunk:2 * chunk]
    flat += [("wnconvtr", up) for up in hifi["upsampler"]]
    flat += stream[2 * chunk:3 * chunk]
    flat += [("hifires", rb) for rb in hifi["resblocks"]]
    flat += stream[3 * chunk:]
    flat += [("wnconv", hifi["conv_post"])]

    for idx, (kind, tree) in enumerate(flat):
        p = f"layers.{idx}"
        if kind == "postnet":
            _x_conv(sd, f"{p}.0", tree["conv"])
            _x_bn_identity(sd, f"{p}.1", tree["norm"])
        elif kind == "conv":
            _x_conv(sd, f"{p}.conv.conv", tree)
        elif kind == "convtr":
            _x_convT(sd, f"{p}.convtr.convtr", tree)
        elif kind == "res":
            _x_conv(sd, f"{p}.block.1.conv.conv", tree["conv1"])
            _x_conv(sd, f"{p}.block.3.conv.conv", tree["conv2"])
        elif kind == "lstm":
            _x_lstm(sd, f"{p}.lstm", tree)
        elif kind == "wnconv":
            _x_wn(sd, p, tree)
        elif kind == "wnconvtr":
            _x_wn(sd, p, tree, transpose=True)
        elif kind == "hifires":
            for j, c in enumerate(tree["convs1"]):
                _x_wn(sd, f"{p}.convs1.{j}", c)
            for j, c in enumerate(tree["convs2"]):
                _x_wn(sd, f"{p}.convs2.{j}", c)
    return sd


def export_aligner(params: dict) -> dict:
    """Raw aligner checkpoint layout (reference aligner/loader.py:22-58):
    sub-dicts + Sequential conv slots at 1+3i."""
    aligner_state: dict = {}
    for name in ("t_conv", "f_conv"):
        for i, cp in enumerate(params[name]):
            prefix = f"{name}.{1 + 3 * i}"
            aligner_state[f"{prefix}.weight"] = _t(
                np.transpose(np.asarray(cp["weight"]), (2, 1, 0)))
            aligner_state[f"{prefix}.bias"] = _t(cp["bias"])
    return {
        "aligner_state": aligner_state,
        "text_emb_state": {"weight": _t(params["embed_text"]["embedding"])},
        "unit_emb_state": {"weight": _t(params["embed_unit"]["embedding"])},
    }


def export_w2v2_raw(params: dict) -> dict:
    """fairseq1-style wav2vec2 keys (the form fairseq2's loader remaps)."""
    sd: dict = {}
    for i, cp in enumerate(params["feature_extractor"]):
        _x_conv(sd, f"feature_extractor.conv_layers.{i}.0", cp["conv"])
        _x_ln(sd, f"feature_extractor.conv_layers.{i}.2.1", cp["norm"])
    _x_ln(sd, "layer_norm", params["post_extract_norm"])
    _x_lin(sd, "post_extract_proj", params["post_extract_proj"])
    # pos_conv is weight-normed with dim=2 (g over the kernel axis)
    pc = params["pos_conv"]
    w = np.transpose(np.asarray(pc["weight"]), (2, 1, 0))   # (out, in/g, k)
    gnorm = np.sqrt((w ** 2).sum(axis=(0, 1), keepdims=True))
    sd["encoder.pos_conv.0.weight_g"] = _t(gnorm)
    sd["encoder.pos_conv.0.weight_v"] = _t(w)
    sd["encoder.pos_conv.0.bias"] = _t(pc["bias"])
    for i, lp in enumerate(_unstack(params["layers"])):
        p = f"encoder.layers.{i}"
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        for k in ("q_proj", "k_proj", "v_proj"):
            _x_lin(sd, f"{p}.self_attn.{k}", lp["self_attn"][k])
        _x_lin(sd, f"{p}.self_attn.out_proj", lp["self_attn"]["output_proj"])
        _x_lin(sd, f"{p}.fc1", lp["ffn"]["inner_proj"])
        _x_lin(sd, f"{p}.fc2", lp["ffn"]["output_proj"])
        _x_ln(sd, f"{p}.final_layer_norm", lp["ffn"]["layer_norm"])
    _x_ln(sd, "encoder.layer_norm", params["encoder_norm"])
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




def export_conformer_shaw_fairseq1(se: dict) -> dict:
    """Export the speech-encoder conformer pieces under the FAIRSEQ1 w2v-BERT
    key names the reference's convert_conformer_shaw_checkpoint consumes
    (models/conformer_shaw/loader.py:44-74 LHS patterns)."""
    sd: dict = {}
    _x_ln(sd, "layer_norm", se["feature_projection"]["layer_norm"])
    _x_lin(sd, "post_extract_proj", se["feature_projection"]["projection"])
    for i, lp in enumerate(_unstack(se["encoder"])):
        p = f"encoder.layers.{i}"
        for n in (1, 2):
            _x_ln(sd, f"{p}.ffn{n}.layer_norm", lp[f"ffn{n}"]["layer_norm"])
            _x_lin(sd, f"{p}.ffn{n}.w_1", lp[f"ffn{n}"]["inner_proj"])
            _x_lin(sd, f"{p}.ffn{n}.w_2", lp[f"ffn{n}"]["output_proj"])
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        for k in ("q_proj", "k_proj", "v_proj"):
            _x_lin(sd, f"{p}.self_attn.{k}", lp["self_attn"][k])
        _x_lin(sd, f"{p}.self_attn.out_proj", lp["self_attn"]["output_proj"])
        _x_embed(sd, f"{p}.self_attn.rel_k_embedding",
                 lp["self_attn"]["rel_k_embed"])
        conv = lp["conv"]
        _x_ln(sd, f"{p}.conv_module.layer_norm", conv["layer_norm"])
        _x_pointwise(sd, f"{p}.conv_module.pointwise_conv1",
                     conv["pointwise_conv1"])
        _x_conv(sd, f"{p}.conv_module.depthwise_conv", conv["depthwise_conv"])
        _x_ln(sd, f"{p}.conv_module.layer_norm2", conv["norm"])
        _x_pointwise(sd, f"{p}.conv_module.pointwise_conv2",
                     conv["pointwise_conv2"])
        _x_ln(sd, f"{p}.final_layer_norm", lp["layer_norm"])
    # pretraining-only tensors present in real checkpoints; must be dropped
    sd["mask_emb"] = torch.zeros(4)
    sd["quantizer.vars"] = torch.zeros(1, 8, 2)
    sd["quantizer.weight_proj.weight"] = torch.zeros(8, 4)
    sd["project_q.weight"] = torch.zeros(4, 4)
    sd["mlm_proj.weight"] = torch.zeros(4, 4)
    return sd


def export_monotonic_fairseq1(params: dict) -> dict:
    """fairseq1 key space for the EMMA monotonic decoder ('decoder.*',
    encoder_attn.{source,target}_energy_layer / energy_bias — reference
    monotonic_decoder/loader.py:31-49), with the control-symbol permutation
    PRE-INVERTED so monotonic_tree_from_pt returns the original tree."""
    sd: dict = {"decoder.version": torch.zeros(1),
                "decoder.embed_positions._float_tensor": torch.zeros(1)}
    for i, lp in enumerate(_unstack(params["layers"])):
        p = f"decoder.layers.{i}"
        _x_ln(sd, f"{p}.self_attn_layer_norm", lp["self_attn_layer_norm"])
        for k in ("q_proj", "k_proj", "v_proj"):
            _x_lin(sd, f"{p}.self_attn.{k}", lp["self_attn"][k])
        _x_lin(sd, f"{p}.self_attn.out_proj", lp["self_attn"]["output_proj"])
        _x_ln(sd, f"{p}.encoder_attn_layer_norm", lp["cross_attn_layer_norm"])
        for k in ("q_proj", "k_proj", "v_proj"):
            _x_lin(sd, f"{p}.encoder_attn.{k}", lp["cross_attn"][k])
        _x_lin(sd, f"{p}.encoder_attn.out_proj", lp["cross_attn"]["output_proj"])
        sd[f"{p}.encoder_attn.energy_bias"] = _t(lp["p_choose"]["energy_bias"])
        for j, (qp, kp) in enumerate(zip(lp["p_choose"]["q_energy_proj"],
                                         lp["p_choose"]["k_energy_proj"])):
            _x_lin(sd, f"{p}.encoder_attn.target_energy_layer.layers.{2 * j}", qp)
            _x_lin(sd, f"{p}.encoder_attn.source_energy_layer.layers.{2 * j}", kp)
        _x_ln(sd, f"{p}.final_layer_norm", lp["ffn"]["layer_norm"])
        _x_lin(sd, f"{p}.fc1", lp["ffn"]["inner_proj"])
        _x_lin(sd, f"{p}.fc2", lp["ffn"]["output_proj"])
    _x_ln(sd, "decoder.layer_norm", params["layer_norm"])
    # invert the (BOS,PAD,EOS,UNK)->(PAD,UNK,BOS,EOS) permutation the
    # converter applies: f1[[1,3,0,2]] = ours[[0,1,2,3]]
    emb = np.array(np.asarray(params["embed"]["embedding"]))
    emb[[1, 3, 0, 2]] = emb[[0, 1, 2, 3]].copy()
    sd["decoder.output_projection.weight"] = _t(emb)
    sd["decoder.embed_tokens.weight"] = _t(emb)
    return sd
