"""Checkpoint bridge: HF transformers SeamlessM4Tv2 torch state -> this framework's
parameter pytrees.

This is the TPU equivalent of the reference's fairseq1->fairseq2 checkpoint converter
(models/unity/loader.py:27-155). The HF weights are themselves converted from the
reference release with the control-symbol permutation / char reorder / dummy-token
drop already applied and validated, so targeting the HF layout gives bit-faithful
loading of the public checkpoints without re-deriving those fixups. (A direct
fairseq2 .pt import path lives in convert_fairseq2.py.)

All torch tensors convert lazily to numpy; linear weights transpose to (in, out);
conv weights to WIO; ConvTranspose to (k, in, out); weight-norm folds to plain
weights.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy()


def _linear(mod) -> dict:
    p = {"weight": _np(mod.weight).T}
    if getattr(mod, "bias", None) is not None:
        p["bias"] = _np(mod.bias)
    return p


def _ln(mod) -> dict:
    return {"scale": _np(mod.weight), "bias": _np(mod.bias)}


def _embed(mod) -> dict:
    return {"embedding": _np(mod.weight)}


def _conv1d(mod) -> dict:
    p = {"weight": np.transpose(_np(mod.weight), (2, 1, 0))}
    if mod.bias is not None:
        p["bias"] = _np(mod.bias)
    return p


def _pointwise(mod) -> dict:
    return {"weight": _np(mod.weight)[:, :, 0].T}


def _conv_transpose1d(mod) -> dict:
    p = {"weight": np.transpose(_np(mod.weight), (2, 0, 1))}
    if mod.bias is not None:
        p["bias"] = _np(mod.bias)
    return p


def _batch_norm_fold(bn) -> dict:
    eps = bn.eps
    scale = _np(bn.weight) / np.sqrt(_np(bn.running_var) + eps)
    return {"scale": scale, "bias": _np(bn.bias) - _np(bn.running_mean) * scale}


def _mha(attn) -> dict:
    """HF attention modules name projections q_proj/k_proj/v_proj/out_proj or
    linear_q/linear_k/linear_v/linear_out."""
    q = getattr(attn, "q_proj", None) or attn.linear_q
    k = getattr(attn, "k_proj", None) or attn.linear_k
    v = getattr(attn, "v_proj", None) or attn.linear_v
    o = getattr(attn, "out_proj", None) or attn.linear_out
    return {"q_proj": _linear(q), "k_proj": _linear(k), "v_proj": _linear(v),
            "output_proj": _linear(o)}


def _stack(layers: list) -> dict:
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


# ---------------------------------------------------------------------------
# speech encoder
# ---------------------------------------------------------------------------

def _speech_ffn(ffn) -> dict:
    return {"inner_proj": _linear(ffn.intermediate_dense),
            "output_proj": _linear(ffn.output_dense)}


def _conformer_layer(lyr, *, v2: bool) -> dict:
    sa = _mha(lyr.self_attn)
    if v2:
        sa["rel_k_embed"] = _embed(lyr.self_attn.distance_embedding)
    else:
        sa["r_proj"] = _linear(lyr.self_attn.linear_pos)
        sa["u_bias"] = _np(lyr.self_attn.pos_bias_u)
        sa["v_bias"] = _np(lyr.self_attn.pos_bias_v)
    conv = {
        "layer_norm": _ln(lyr.conv_module.layer_norm),
        "pointwise_conv1": _pointwise(lyr.conv_module.pointwise_conv1),
        "depthwise_conv": _conv1d(lyr.conv_module.depthwise_conv),
        "norm": (_ln(lyr.conv_module.depthwise_layer_norm) if v2
                 else _batch_norm_fold(lyr.conv_module.batch_norm)),
        "pointwise_conv2": _pointwise(lyr.conv_module.pointwise_conv2),
    }
    return {
        "ffn1": {"layer_norm": _ln(lyr.ffn1_layer_norm), **_speech_ffn(lyr.ffn1)},
        "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
        "self_attn": sa,
        "conv": conv,
        "ffn2": {"layer_norm": _ln(lyr.ffn2_layer_norm), **_speech_ffn(lyr.ffn2)},
        "layer_norm": _ln(lyr.final_layer_norm),
    }


def convert_speech_encoder(mod, *, v2: bool = True) -> dict:
    layers = [_conformer_layer(l, v2=v2) for l in mod.encoder.layers]
    params = {
        "feature_projection": {
            "layer_norm": _ln(mod.feature_projection.layer_norm),
            "projection": _linear(mod.feature_projection.projection),
        },
        "encoder": _stack(layers),
        "intermediate_ffn": _speech_ffn(mod.intermediate_ffn),
        "inner_layer_norm": _ln(mod.inner_layer_norm),
        "adaptor": [],
    }
    if mod.adapter is not None:
        for a in mod.adapter.layers:
            params["adaptor"].append({
                "residual_layer_norm": _ln(a.residual_layer_norm),
                "residual_conv": _conv1d(a.residual_conv),
                "self_attn_layer_norm": _ln(a.self_attn_layer_norm),
                "self_attn_conv": _conv1d(a.self_attn_conv),
                "self_attn": _mha(a.self_attn),
                "ffn_layer_norm": _ln(a.ffn_layer_norm),
                "ffn": _speech_ffn(a.ffn),
            })
    return params


# ---------------------------------------------------------------------------
# text encoder / decoder
# ---------------------------------------------------------------------------

def _text_ffn(lyr) -> dict:
    # HF FeedForwardNetwork: fc1 / fc2
    return {"layer_norm": _ln(lyr.ffn_layer_norm),
            "inner_proj": _linear(lyr.ffn.fc1),
            "output_proj": _linear(lyr.ffn.fc2)}


def convert_text_encoder(mod) -> dict:
    layers = []
    for lyr in mod.layers:
        layers.append({
            "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
            "self_attn": _mha(lyr.self_attn),
            "ffn": _text_ffn(lyr),
        })
    return {
        "embed": _embed(mod.embed_tokens),
        "stack": {"layers": _stack(layers), "layer_norm": _ln(mod.layer_norm)},
    }


def convert_text_decoder(mod) -> dict:
    layers = []
    for lyr in mod.layers:
        layers.append({
            "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
            "self_attn": _mha(lyr.self_attn),
            "cross_attn_layer_norm": _ln(lyr.cross_attention_layer_norm),
            "cross_attn": _mha(lyr.cross_attention),
            "ffn": _text_ffn(lyr),
        })
    return {
        "embed": _embed(mod.embed_tokens),
        "stack": {"layers": _stack(layers), "layer_norm": _ln(mod.layer_norm)},
    }


# ---------------------------------------------------------------------------
# T2U
# ---------------------------------------------------------------------------

def _vp(mod) -> dict:
    return {"conv1": _conv1d(mod.conv1), "ln1": _ln(mod.ln1),
            "conv2": _conv1d(mod.conv2), "ln2": _ln(mod.ln2),
            "proj": _linear(mod.proj)}


def convert_nar_t2u(t2u_model, lm_head) -> dict:
    """t2u_model: SeamlessM4Tv2TextToUnitModel (encoder + decoder); lm_head: Linear."""
    enc_layers = []
    for lyr in t2u_model.encoder.layers:
        enc_layers.append({
            "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
            "self_attn": _mha(lyr.self_attn),
            "ffn": _text_ffn(lyr),
        })
    dec = t2u_model.decoder
    dec_layers = []
    for lyr in dec.layers:
        dec_layers.append({
            "self_attn": _mha(lyr.self_attn),
            "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
            "conv1": _conv1d(lyr.conv1),
            "conv2": _conv1d(lyr.conv2),
            "conv_layer_norm": _ln(lyr.conv_layer_norm),
        })
    return {
        "encoder": {"layers": _stack(enc_layers),
                    "layer_norm": _ln(t2u_model.encoder.layer_norm)},
        "embed_char": _embed(dec.embed_char),
        "pos_emb_alpha_char": _np(dec.pos_emb_alpha_char),
        "pos_emb_alpha": _np(dec.pos_emb_alpha),
        "duration_predictor": _vp(dec.duration_predictor),
        "decoder_layers": _stack(dec_layers),
        "layer_norm": _ln(dec.layer_norm),
        "final_proj": _linear(lm_head),
    }


def convert_ar_t2u(t2u_model, lm_head=None) -> dict:
    """v1 SeamlessM4TTextToUnitModel: standard enc-dec over the unit vocab with
    the lm_head tied to the decoder embedding (reference models/unity/model.py
    :263-327). ``lm_head`` is accepted for API symmetry; the tie makes it
    redundant."""
    enc = t2u_model.encoder
    enc_layers = [{
        "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
        "self_attn": _mha(lyr.self_attn),
        "ffn": _text_ffn(lyr),
    } for lyr in enc.layers]
    dec = t2u_model.decoder
    dec_layers = [{
        "self_attn_layer_norm": _ln(lyr.self_attn_layer_norm),
        "self_attn": _mha(lyr.self_attn),
        "cross_attn_layer_norm": _ln(lyr.cross_attention_layer_norm),
        "cross_attn": _mha(lyr.cross_attention),
        "ffn": _text_ffn(lyr),
    } for lyr in dec.layers]
    return {
        "encoder": {"layers": _stack(enc_layers), "layer_norm": _ln(enc.layer_norm)},
        "embed": _embed(dec.embed_tokens),
        "decoder": {"layers": _stack(dec_layers), "layer_norm": _ln(dec.layer_norm)},
    }


# ---------------------------------------------------------------------------
# vocoder
# ---------------------------------------------------------------------------

def convert_hf_code_hifigan(mod) -> dict:
    """SeamlessM4Tv2CodeHifiGan (weight-norm removed or not; we fold if present)."""
    try:
        mod.hifi_gan.remove_weight_norm()  # folds g/v -> weight in place
    except Exception:
        pass
    hg = mod.hifi_gan
    params = {
        "unit_embedding": _embed(mod.unit_embedding),
        "speaker_embedding": _embed(mod.speaker_embedding),
        "language_embedding": _embed(mod.language_embedding),
        "dur_predictor": _vp(mod.dur_predictor),
        "hifigan": {
            "conv_pre": _conv1d(hg.conv_pre),
            "upsampler": [_conv_transpose1d(u) for u in hg.upsampler],
            "resblocks": [{"convs1": [_conv1d(c) for c in rb.convs1],
                           "convs2": [_conv1d(c) for c in rb.convs2]}
                          for rb in hg.resblocks],
            "conv_post": _conv1d(hg.conv_post),
        },
    }
    return params


# ---------------------------------------------------------------------------
# top-level
# ---------------------------------------------------------------------------

def convert_hf_seamless_m4t_v2(model) -> Dict[str, Any]:
    """SeamlessM4Tv2Model (the full multitask model) -> UnitY param pytree matching
    models/unity/model.py:unity_init structure."""
    params = {
        "speech_encoder": convert_speech_encoder(model.speech_encoder, v2=True),
        "text_decoder": convert_text_decoder(model.text_decoder),
    }
    if getattr(model, "text_encoder", None) is not None:
        params["text_encoder"] = convert_text_encoder(model.text_encoder)
    if getattr(model, "t2u_model", None) is not None:
        params["t2u"] = convert_nar_t2u(model.t2u_model.model, model.t2u_model.lm_head)
    return params


def convert_hf_seamless_m4t_v1(model) -> Dict[str, Any]:
    """SeamlessM4TModel (v1: XL-rel-pos conformer with batch-norm conv module,
    AR T2U) -> UnitY param pytree; HF transformers is the numerics oracle for
    the reference's seamlessM4T_{medium,large} checkpoints."""
    params = {
        "speech_encoder": convert_speech_encoder(model.speech_encoder, v2=False),
        "text_decoder": convert_text_decoder(model.text_decoder),
    }
    if getattr(model, "text_encoder", None) is not None:
        params["text_encoder"] = convert_text_encoder(model.text_encoder)
    if getattr(model, "t2u_model", None) is not None:
        params["t2u"] = convert_ar_t2u(model.t2u_model.model)
    return params


def to_jax(params, dtype=None):
    """numpy pytree -> jax arrays (optionally casting float params)."""
    import jax
    import jax.numpy as jnp

    def conv(x):
        a = jnp.asarray(x)
        if dtype is not None and a.dtype in (jnp.float32, jnp.float64):
            a = a.astype(dtype)
        return a

    return jax.tree.map(conv, params)
