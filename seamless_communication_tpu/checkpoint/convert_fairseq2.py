"""Converter for the reference's original .pt checkpoints (fairseq1/fairseq2 keyed)
into this framework's parameter pytrees.

Reproduces ``convert_unity_checkpoint`` semantics (reference
models/unity/loader.py:27-176): the fairseq1->fairseq2 key remap (loader.py:179-389),
the NLLB-100 dummy-token drop, the control-symbol permutation
(BOS,PAD,EOS,UNK)->(PAD,UNK,BOS,EOS) of the first four embedding rows, the
char-embedding reorder to sorted-SPM order (loader.py:158-176), and tied-embedding
dedup — then maps fairseq2 module paths onto this framework's tree with the layout
transforms (linear weights transposed to (in,out); torch convs to WIO; batch-norm
and weight-norm folded).

Also handles the monotonic decoder (monotonic_decoder/loader.py) and the unit
HiFi-GAN vocoder (vocoder/loader.py: raw speech-resynthesis keys).
"""

from __future__ import annotations

import re
from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# layout helpers (torch -> jax)
# ---------------------------------------------------------------------------

def _lin_w(w) -> np.ndarray:
    return np.asarray(w).T                       # (out,in) -> (in,out)


def _conv_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 1, 0))  # (out,in,k) -> (k,in,out)


def _convT_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 0, 1))  # (in,out,k) -> (k,in,out)


def _fold_weight_norm(g, v) -> np.ndarray:
    """Fold torch weight_norm: w = g * v / ||v||, with the norm taken over the
    axes where g is size-1 (dim=0 for most convs; fairseq's pos_conv uses
    dim=2, giving g shape (1,1,k))."""
    g, v = np.asarray(g), np.asarray(v)
    if g.ndim == v.ndim:
        axes = tuple(i for i in range(v.ndim) if g.shape[i] == 1)
    else:
        axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=g.ndim == v.ndim))
    return g * v / np.maximum(norm, 1e-12)


def _ln(sd: Mapping, prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _linear(sd: Mapping, prefix: str) -> dict:
    p = {"weight": _lin_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _conv(sd: Mapping, prefix: str) -> dict:
    p = {"weight": _conv_w(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _pointwise(sd: Mapping, prefix: str) -> dict:
    w = np.asarray(sd[f"{prefix}.weight"])
    return {"weight": w[:, :, 0].T}


def _embed(sd: Mapping, prefix: str) -> dict:
    return {"embedding": np.asarray(sd[f"{prefix}.weight"])}


def _bn_fold(sd: Mapping, prefix: str, eps: float = 1e-5) -> dict:
    scale = (np.asarray(sd[f"{prefix}.weight"])
             / np.sqrt(np.asarray(sd[f"{prefix}.running_var"]) + eps))
    return {"scale": scale,
            "bias": np.asarray(sd[f"{prefix}.bias"])
            - np.asarray(sd[f"{prefix}.running_mean"]) * scale}


def _mha(sd: Mapping, prefix: str) -> dict:
    return {"q_proj": _linear(sd, f"{prefix}.q_proj"),
            "k_proj": _linear(sd, f"{prefix}.k_proj"),
            "v_proj": _linear(sd, f"{prefix}.v_proj"),
            "output_proj": _linear(sd, f"{prefix}.output_proj")}


def _stack(layers: List[dict]) -> dict:
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def _num_layers(sd: Mapping, pattern: str) -> int:
    rx = re.compile(pattern)
    idx = {int(m.group(1)) for k in sd if (m := rx.match(k))}
    return max(idx) + 1 if idx else 0


# ---------------------------------------------------------------------------
# fairseq1 -> fairseq2 key remap (ported table, loader.py:179-389)
# ---------------------------------------------------------------------------

def fairseq1_to_fairseq2(state_dict: Mapping[str, np.ndarray], *,
                         has_prosody: bool = False, has_t2u: bool = True,
                         has_text_encoder: bool = True,
                         conformer_adaptor: bool = False) -> Dict[str, np.ndarray]:
    if has_prosody:
        enc, dec = "s2t_model.encoder", "s2t_model.decoder"
        t2u_enc, t2u_dec = "t2s_model.encoder", "t2s_model.decoder"
    elif has_t2u:
        enc, dec = "encoder", "target_letter_decoder"
        t2u_enc, t2u_dec = "synthesizer_encoder", "decoder"
    elif has_text_encoder:
        enc, dec = "speech_encoder", "shared_decoder"
        t2u_enc = t2u_dec = None
    else:
        enc, dec = "encoder", "decoder"
        t2u_enc = t2u_dec = None

    w2v = rf"^{enc}\.w2v_encoder\.w2v_model"
    rules = [
        # speech frontend
        (rf"{w2v}\.encoder\.pos_conv\.0\.", "speech_encoder_frontend.pos_encoder.conv."),
        (rf"{w2v}\.layer_norm\.", "speech_encoder_frontend.post_extract_layer_norm."),
        (rf"{w2v}\.post_extract_proj\.", "speech_encoder_frontend.model_dim_proj."),
        (rf"{w2v}\.feature_extractor\.conv_layers\.([0-9]+)\.0\.",
         r"speech_encoder_frontend.feature_extractor.layers.\1.conv."),
        (rf"{w2v}\.feature_extractor\.conv_layers\.([0-9]+)\.2\.1\.",
         r"speech_encoder_frontend.feature_extractor.layers.\1.layer_norm."),
        # group-norm variant: only block 0 carries a bare GroupNorm at .2.
        # (loader.py:211); must stay AFTER the .2.1. rule so layer-norm-style
        # block-0 keys keep their layer_norm mapping (first-match order)
        (rf"{w2v}\.feature_extractor\.conv_layers\.0\.2\.",
         "speech_encoder_frontend.feature_extractor.layers.0.group_norm."),
        # conformer layers
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.conv_module\.batch_norm\.",
         r"speech_encoder.inner.layers.\1.conv.batch_norm."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.conv_module\.layer_norm2\.",
         r"speech_encoder.inner.layers.\1.conv.layer_norm."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.conv_module\.depthwise_conv\.",
         r"speech_encoder.inner.layers.\1.conv.depthwise_conv."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.conv_module\.layer_norm\.",
         r"speech_encoder.inner.layers.\1.conv_layer_norm."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.conv_module\.pointwise_conv1\.",
         r"speech_encoder.inner.layers.\1.conv.pointwise_conv1."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.conv_module\.pointwise_conv2\.",
         r"speech_encoder.inner.layers.\1.conv.pointwise_conv2."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.ffn(1|2)\.layer_norm\.",
         r"speech_encoder.inner.layers.\1.ffn\2_layer_norm."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.ffn(1|2)\.w_1\.",
         r"speech_encoder.inner.layers.\1.ffn\2.inner_proj."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.ffn(1|2)\.w_2\.",
         r"speech_encoder.inner.layers.\1.ffn\2.output_proj."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn_layer_norm\.",
         r"speech_encoder.inner.layers.\1.self_attn_layer_norm."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.linear_(q|k|v)\.",
         r"speech_encoder.inner.layers.\1.self_attn.\2_proj."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.(q|k|v)_proj\.",
         r"speech_encoder.inner.layers.\1.self_attn.\2_proj."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.rel_k_embedding\.",
         r"speech_encoder.inner.layers.\1.self_attn.sdpa.rel_k_embed."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.(?:linear_out|out_proj)\.",
         r"speech_encoder.inner.layers.\1.self_attn.output_proj."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.linear_pos\.",
         r"speech_encoder.inner.layers.\1.self_attn.sdpa.r_proj."),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.pos_bias_u",
         r"speech_encoder.inner.layers.\1.self_attn.sdpa.u_bias"),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.self_attn\.pos_bias_v",
         r"speech_encoder.inner.layers.\1.self_attn.sdpa.v_bias"),
        (rf"{w2v}\.encoder\.layers\.([0-9]+)\.final_layer_norm\.",
         r"speech_encoder.inner.layers.\1.layer_norm."),
        (rf"{w2v}\.encoder\.layer_norm\.", "speech_encoder.inner_layer_norm."),
        # adaptor
        (rf"^{enc}\.adaptor\.proj\.0\.", "speech_encoder.proj1."),
        (rf"^{enc}\.adaptor\.proj\.2\.", "speech_encoder.proj2."),
        (rf"^{enc}\.adaptor\.out_ln\.", "speech_encoder.layer_norm."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.residual_layer_norm\.",
         r"speech_encoder.adaptor_layers.\1.residual_layer_norm."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.residual_pool\.1\.",
         r"speech_encoder.adaptor_layers.\1.residual_conv."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.attn_pool\.1\.",
         r"speech_encoder.adaptor_layers.\1.self_attn_conv."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.self_attn\.out_proj\.",
         r"speech_encoder.adaptor_layers.\1.self_attn.output_proj."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.self_attn\.",
         r"speech_encoder.adaptor_layers.\1.self_attn."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.self_attn_layer_norm\.",
         r"speech_encoder.adaptor_layers.\1.self_attn_layer_norm."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.fc1\.",
         r"speech_encoder.adaptor_layers.\1.ffn.inner_proj."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.fc2\.",
         r"speech_encoder.adaptor_layers.\1.ffn.output_proj."),
        (rf"^{enc}\.adaptor\.layers\.([0-9]+)\.final_layer_norm\.",
         r"speech_encoder.adaptor_layers.\1.ffn_layer_norm."),
        # text decoder
        (rf"^{dec}\.embed_tokens\.", "text_decoder_frontend.embed."),
        (rf"^{dec}\.layers\.([0-9]+)\.self_attn\.out_proj\.",
         r"text_decoder.layers.\1.self_attn.output_proj."),
        (rf"^{dec}\.layers\.([0-9]+)\.self_attn\.",
         r"text_decoder.layers.\1.self_attn."),
        (rf"^{dec}\.layers\.([0-9]+)\.self_attn_layer_norm\.",
         r"text_decoder.layers.\1.self_attn_layer_norm."),
        (rf"^{dec}\.layers\.([0-9]+)\.encoder_attn\.out_proj\.",
         r"text_decoder.layers.\1.encoder_decoder_attn.output_proj."),
        (rf"^{dec}\.layers\.([0-9]+)\.encoder_attn\.",
         r"text_decoder.layers.\1.encoder_decoder_attn."),
        (rf"^{dec}\.layers\.([0-9]+)\.encoder_attn_layer_norm\.",
         r"text_decoder.layers.\1.encoder_decoder_attn_layer_norm."),
        (rf"^{dec}\.layers\.([0-9]+)\.fc1\.", r"text_decoder.layers.\1.ffn.inner_proj."),
        (rf"^{dec}\.layers\.([0-9]+)\.fc2\.", r"text_decoder.layers.\1.ffn.output_proj."),
        (rf"^{dec}\.layers\.([0-9]+)\.final_layer_norm\.",
         r"text_decoder.layers.\1.ffn_layer_norm."),
        (rf"^{dec}\.layer_norm\.", "text_decoder.layer_norm."),
        (rf"^{dec}\.output_projection\.", "final_proj."),
    ]
    if has_text_encoder:
        rules += [
            (r"^text_encoder\.embed_tokens\.", "text_encoder_frontend.embed."),
            (r"^text_encoder\.layers\.([0-9]+)\.self_attn\.out_proj\.",
             r"text_encoder.layers.\1.self_attn.output_proj."),
            (r"^text_encoder\.layers\.([0-9]+)\.self_attn\.",
             r"text_encoder.layers.\1.self_attn."),
            (r"^text_encoder\.layers\.([0-9]+)\.self_attn_layer_norm\.",
             r"text_encoder.layers.\1.self_attn_layer_norm."),
            # the reference maps encoder_attn keys under text_encoder too
            # (loader.py:248-250) — inert for the released checkpoints (their
            # text encoders have no cross-attention) but kept for exact key-map
            # parity with the reference table
            (r"^text_encoder\.layers\.([0-9]+)\.encoder_attn\.out_proj\.",
             r"text_encoder.layers.\1.encoder_decoder_attn.output_proj."),
            (r"^text_encoder\.layers\.([0-9]+)\.encoder_attn\.",
             r"text_encoder.layers.\1.encoder_decoder_attn."),
            (r"^text_encoder\.layers\.([0-9]+)\.encoder_attn_layer_norm\.",
             r"text_encoder.layers.\1.encoder_decoder_attn_layer_norm."),
            (r"^text_encoder\.layers\.([0-9]+)\.fc1\.",
             r"text_encoder.layers.\1.ffn.inner_proj."),
            (r"^text_encoder\.layers\.([0-9]+)\.fc2\.",
             r"text_encoder.layers.\1.ffn.output_proj."),
            (r"^text_encoder\.layers\.([0-9]+)\.final_layer_norm\.",
             r"text_encoder.layers.\1.ffn_layer_norm."),
            (r"^text_encoder\.layer_norm\.", "text_encoder.layer_norm."),
        ]
    if t2u_enc is not None:
        rules += [
            (rf"^{t2u_enc}\.layers\.([0-9]+)\.self_attn\.out_proj\.",
             r"t2u_model.encoder.layers.\1.self_attn.output_proj."),
            (rf"^{t2u_enc}\.layers\.([0-9]+)\.self_attn\.",
             r"t2u_model.encoder.layers.\1.self_attn."),
            (rf"^{t2u_enc}\.layers\.([0-9]+)\.self_attn_layer_norm\.",
             r"t2u_model.encoder.layers.\1.self_attn_layer_norm."),
            (rf"^{t2u_enc}\.layers\.([0-9]+)\.fc1\.",
             r"t2u_model.encoder.layers.\1.ffn.inner_proj."),
            (rf"^{t2u_enc}\.layers\.([0-9]+)\.fc2\.",
             r"t2u_model.encoder.layers.\1.ffn.output_proj."),
            (rf"^{t2u_enc}\.layers\.([0-9]+)\.final_layer_norm\.",
             r"t2u_model.encoder.layers.\1.ffn_layer_norm."),
            (rf"^{t2u_enc}\.layer_norm\.", "t2u_model.encoder.layer_norm."),
            # t2u decoder frontend
            (rf"^{t2u_dec}\.embed_tokens_text\.", "t2u_model.decoder_frontend.embed_char."),
            (rf"^{t2u_dec}\.embed_tokens_unit\.", "t2u_model.decoder_frontend.embed."),
            (rf"^{t2u_dec}\.embed_tokens\.", "t2u_model.decoder_frontend.embed."),
            (rf"^{t2u_dec}\.var_adaptor\.duration_predictor\.",
             "t2u_model.decoder_frontend.variance_adaptor.duration_predictor."),
            (rf"^{t2u_dec}\.dec_pos_emb_alpha", "t2u_model.decoder_frontend.pos_emb_alpha"),
            (rf"^{t2u_dec}\.char_upsampler\.pos_emb_alpha",
             "t2u_model.decoder_frontend.pos_emb_alpha_char"),
            # t2u decoder layers
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.self_attn\.out_proj\.",
             r"t2u_model.decoder.layers.\1.self_attn.output_proj."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.self_attn\.",
             r"t2u_model.decoder.layers.\1.self_attn."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.(?:self_attn_layer_norm|layer_norm)\.",
             r"t2u_model.decoder.layers.\1.self_attn_layer_norm."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.encoder_attn\.out_proj\.",
             r"t2u_model.decoder.layers.\1.encoder_decoder_attn.output_proj."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.encoder_attn\.",
             r"t2u_model.decoder.layers.\1.encoder_decoder_attn."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.encoder_attn_layer_norm\.",
             r"t2u_model.decoder.layers.\1.encoder_decoder_attn_layer_norm."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.fc1\.",
             r"t2u_model.decoder.layers.\1.ffn.inner_proj."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.fc2\.",
             r"t2u_model.decoder.layers.\1.ffn.output_proj."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.final_layer_norm\.",
             r"t2u_model.decoder.layers.\1.ffn_layer_norm."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.ffn\.ffn\.0\.",
             r"t2u_model.decoder.layers.\1.conv1d.conv1."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.ffn\.ffn\.2\.",
             r"t2u_model.decoder.layers.\1.conv1d.conv2."),
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.ffn\.layer_norm\.",
             r"t2u_model.decoder.layers.\1.conv1d_layer_norm."),
            (rf"^{t2u_dec}\.layer_norm\.", "t2u_model.decoder.layer_norm."),
            (rf"^{t2u_dec}\.output_projection\.", "t2u_model.final_proj."),
        ]
    if has_prosody:
        rules += [
            (rf"^{t2u_dec}\.layers\.([0-9]+)\.film\.",
             r"t2u_model.decoder.layers.\1.film."),
            (r"^global_prosody\.", "prosody_encoder_model."),
            (r"^t2s_model\.global_proj_enc\.", "t2u_model.prosody_proj."),
        ]

    out: Dict[str, np.ndarray] = {}
    compiled = [(re.compile(p), r) for p, r in rules]
    for key, val in state_dict.items():
        for rx, repl in compiled:
            if rx.match(key):
                out[rx.sub(repl, key)] = np.asarray(val)
                break
        # unmatched keys (versions, float_tensors, mask_emb, aligner...) dropped
    return out


def is_fairseq1_unity(sd: Mapping[str, np.ndarray]) -> bool:
    """True for original fairseq1-keyed UnitY checkpoints (all released .pt
    files); fairseq2-native key spaces pass through untouched."""
    return any(".w2v_model." in k for k in sd)


def fairseq1_to_fairseq2_auto(
        state_dict: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """fairseq1_to_fairseq2 with the family flags detected from the key
    prefixes themselves (the reference derives them from the model config;
    the prefixes are unambiguous per family — loader.py:183-200):
    's2t_model.*' = expressive (prosody), 'target_letter_decoder.*' = UnitY
    with t2u, 'shared_decoder.*' = S2T-only with text encoder."""
    has_prosody = any(k.startswith("s2t_model.") for k in state_dict)
    # synthesizer_encoder marks the t2u prefix set even when the checkpoint
    # carries NO text decoder (seamless_streaming_unity: the reference loads
    # it with use_text_decoder=False and t2u_config set, so its 'decoder.*'
    # keys are the T2U decoder — unity_pipeline.py:113-121)
    has_t2u = has_prosody or any(
        k.startswith(("target_letter_decoder.", "synthesizer_encoder."))
        for k in state_dict)
    has_text_encoder = any(k.startswith("text_encoder.") for k in state_dict)
    return fairseq1_to_fairseq2(state_dict, has_prosody=has_prosody,
                                has_t2u=has_t2u,
                                has_text_encoder=has_text_encoder)


def apply_unity_fixups(sd: Dict[str, np.ndarray], *,
                       is_nllb_100: Optional[bool] = None,
                       char_spm_pieces: Optional[Sequence[str]] = None,
                       has_text_encoder: bool = True) -> Dict[str, np.ndarray]:
    """The correctness-critical embedding fixups (loader.py:116-155).

    ``is_nllb_100=None`` auto-detects from the 256103-row fairseq NLLB-100
    table; every fixup is skipped for text-decoder-less checkpoints
    (seamless_streaming_unity carries no final_proj — loader.py:115 guards
    the same way)."""
    if is_nllb_100 is None:
        fp = sd.get("final_proj.weight")
        is_nllb_100 = fp is not None and np.shape(fp)[0] == 256103
    if "final_proj.weight" in sd:
        embeds = np.asarray(sd["final_proj.weight"])
        if is_nllb_100 and embeds.shape[0] == 256103:
            embeds = embeds[:-1]
        # control-symbol permutation (BOS,PAD,EOS,UNK) -> (PAD,UNK,BOS,EOS)
        embeds = embeds.copy()
        embeds[[0, 1, 2, 3]] = embeds[[1, 3, 0, 2]]
        sd["final_proj.weight"] = embeds
        sd["text_decoder_frontend.embed.weight"] = embeds
        if has_text_encoder:
            sd["text_encoder_frontend.embed.weight"] = embeds
    ce = sd.get("t2u_model.decoder_frontend.embed_char.weight")
    if ce is not None and char_spm_pieces is not None:
        # reorder rows: model order (spm) -> dictionary order (sorted pieces),
        # loader.py:158-176
        spm_order = list(char_spm_pieces)[4:] if len(char_spm_pieces) > 4 else []
        spm_to_dict = {ch: i for i, ch in enumerate(sorted(spm_order), start=4)}
        mapping = [0, 1, 2, 3] + [spm_to_dict[ch] for ch in spm_order]
        ce = np.asarray(ce).copy()
        ce[np.arange(len(mapping))] = ce[mapping]
        sd["t2u_model.decoder_frontend.embed_char.weight"] = ce
    if "t2u_model.final_proj.weight" in sd and \
            "t2u_model.decoder_frontend.embed.weight" in sd:
        sd["t2u_model.decoder_frontend.embed.weight"] = \
            sd["t2u_model.final_proj.weight"]
    return sd


# ---------------------------------------------------------------------------
# fairseq2 paths -> this framework's pytree
# ---------------------------------------------------------------------------

def _conformer_layer_tree(sd: Mapping[str, np.ndarray], p: str) -> dict:
    """One conformer block (ffn1 / self-attn (Shaw or XL) / conv module / ffn2)
    at fairseq2-path prefix ``p``."""
    sa = _mha(sd, f"{p}.self_attn")
    if f"{p}.self_attn.sdpa.rel_k_embed.weight" in sd:
        sa["rel_k_embed"] = _embed(sd, f"{p}.self_attn.sdpa.rel_k_embed")
    if f"{p}.self_attn.sdpa.r_proj.weight" in sd:
        sa["r_proj"] = _linear(sd, f"{p}.self_attn.sdpa.r_proj")
        sa["u_bias"] = np.asarray(sd[f"{p}.self_attn.sdpa.u_bias"])
        sa["v_bias"] = np.asarray(sd[f"{p}.self_attn.sdpa.v_bias"])
    conv = {
        "layer_norm": _ln(sd, f"{p}.conv_layer_norm"),
        "pointwise_conv1": _pointwise(sd, f"{p}.conv.pointwise_conv1"),
        "depthwise_conv": _conv(sd, f"{p}.conv.depthwise_conv"),
        "norm": (_ln(sd, f"{p}.conv.layer_norm")
                 if f"{p}.conv.layer_norm.weight" in sd
                 else _bn_fold(sd, f"{p}.conv.batch_norm")),
        "pointwise_conv2": _pointwise(sd, f"{p}.conv.pointwise_conv2"),
    }
    return {
        "ffn1": {"layer_norm": _ln(sd, f"{p}.ffn1_layer_norm"),
                 "inner_proj": _linear(sd, f"{p}.ffn1.inner_proj"),
                 "output_proj": _linear(sd, f"{p}.ffn1.output_proj")},
        "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
        "self_attn": sa,
        "conv": conv,
        "ffn2": {"layer_norm": _ln(sd, f"{p}.ffn2_layer_norm"),
                 "inner_proj": _linear(sd, f"{p}.ffn2.inner_proj"),
                 "output_proj": _linear(sd, f"{p}.ffn2.output_proj")},
        "layer_norm": _ln(sd, f"{p}.layer_norm"),
    }


def unity_tree_from_fairseq2(sd: Mapping[str, np.ndarray], *, v2: bool = True) -> dict:
    """Build the models/unity param pytree from fairseq2-path tensors."""
    n_enc = _num_layers(sd, r"speech_encoder\.inner\.layers\.([0-9]+)\.")
    enc_layers = [_conformer_layer_tree(sd, f"speech_encoder.inner.layers.{i}")
                  for i in range(n_enc)]

    n_adapt = _num_layers(sd, r"speech_encoder\.adaptor_layers\.([0-9]+)\.")
    adaptors = []
    for i in range(n_adapt):
        p = f"speech_encoder.adaptor_layers.{i}"
        adaptors.append({
            "residual_layer_norm": _ln(sd, f"{p}.residual_layer_norm"),
            "residual_conv": _conv(sd, f"{p}.residual_conv"),
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "self_attn_conv": _conv(sd, f"{p}.self_attn_conv"),
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "ffn_layer_norm": _ln(sd, f"{p}.ffn_layer_norm"),
            "ffn": {"inner_proj": _linear(sd, f"{p}.ffn.inner_proj"),
                    "output_proj": _linear(sd, f"{p}.ffn.output_proj")},
        })

    params: dict = {
        "speech_encoder": {
            "feature_projection": {
                "layer_norm": _ln(sd, "speech_encoder_frontend.post_extract_layer_norm"),
                "projection": _linear(sd, "speech_encoder_frontend.model_dim_proj"),
            },
            "encoder": _stack(enc_layers),
            "intermediate_ffn": {"inner_proj": _linear(sd, "speech_encoder.proj1"),
                                 "output_proj": _linear(sd, "speech_encoder.proj2")},
            # fairseq2's misplaced post-conformer LN + adaptor out_ln collapse to
            # inner_layer_norm (applied pre-expand) and layer_norm (final)
            "inner_layer_norm": _ln(sd, "speech_encoder.layer_norm"),
            "adaptor": adaptors,
        },
    }
    # seamless_streaming_unity carries NO text decoder (the reference loads it
    # with use_text_decoder=False; text decoding lives in the separate
    # monotonic-decoder checkpoint — streaming/agents/unity_pipeline.py:113-121)
    if "text_decoder.layer_norm.weight" in sd:
        params["text_decoder"] = _decoder_tree(sd, "text_decoder",
                                               "text_decoder_frontend.embed")
    if "text_encoder.layer_norm.weight" in sd:
        params["text_encoder"] = _encoder_tree(sd, "text_encoder",
                                               "text_encoder_frontend.embed")
    # T2U dispatch: NAR (v2) layers carry conv1d blocks, AR (v1) layers carry
    # cross-attention (reference t2u_builder.py archs base vs base_nar)
    if "t2u_model.decoder.layers.0.conv1d.conv1.weight" in sd:
        params["t2u"] = _nar_t2u_tree(sd)
    elif "t2u_model.decoder.layers.0.encoder_decoder_attn.q_proj.weight" in sd:
        params["t2u"] = _ar_t2u_tree(sd)
    # expressive prosody encoder (global_prosody -> prosody_encoder_model)
    if "prosody_encoder_model.fc.weight" in sd:
        params["prosody_encoder"] = ecapa_tree_from_fairseq2(
            sd, prefix="prosody_encoder_model")
    return params


def _encoder_tree(sd, prefix, embed_prefix) -> dict:
    n = _num_layers(sd, rf"{prefix}\.layers\.([0-9]+)\.")
    layers = [{
        "self_attn_layer_norm": _ln(sd, f"{prefix}.layers.{i}.self_attn_layer_norm"),
        "self_attn": _mha(sd, f"{prefix}.layers.{i}.self_attn"),
        "ffn": {"layer_norm": _ln(sd, f"{prefix}.layers.{i}.ffn_layer_norm"),
                "inner_proj": _linear(sd, f"{prefix}.layers.{i}.ffn.inner_proj"),
                "output_proj": _linear(sd, f"{prefix}.layers.{i}.ffn.output_proj")},
    } for i in range(n)]
    return {"embed": _embed(sd, embed_prefix),
            "stack": {"layers": _stack(layers),
                      "layer_norm": _ln(sd, f"{prefix}.layer_norm")}}


def _decoder_tree(sd, prefix, embed_prefix) -> dict:
    n = _num_layers(sd, rf"{prefix}\.layers\.([0-9]+)\.")
    layers = [{
        "self_attn_layer_norm": _ln(sd, f"{prefix}.layers.{i}.self_attn_layer_norm"),
        "self_attn": _mha(sd, f"{prefix}.layers.{i}.self_attn"),
        "cross_attn_layer_norm": _ln(
            sd, f"{prefix}.layers.{i}.encoder_decoder_attn_layer_norm"),
        "cross_attn": _mha(sd, f"{prefix}.layers.{i}.encoder_decoder_attn"),
        "ffn": {"layer_norm": _ln(sd, f"{prefix}.layers.{i}.ffn_layer_norm"),
                "inner_proj": _linear(sd, f"{prefix}.layers.{i}.ffn.inner_proj"),
                "output_proj": _linear(sd, f"{prefix}.layers.{i}.ffn.output_proj")},
    } for i in range(n)]
    return {"embed": _embed(sd, embed_prefix),
            "stack": {"layers": _stack(layers),
                      "layer_norm": _ln(sd, f"{prefix}.layer_norm")}}


def _nar_t2u_tree(sd) -> dict:
    enc = _encoder_tree(sd, "t2u_model.encoder", "t2u_model.decoder_frontend.embed")
    n = _num_layers(sd, r"t2u_model\.decoder\.layers\.([0-9]+)\.")
    dec_layers = [{
        "self_attn": _mha(sd, f"t2u_model.decoder.layers.{i}.self_attn"),
        "self_attn_layer_norm": _ln(
            sd, f"t2u_model.decoder.layers.{i}.self_attn_layer_norm"),
        "conv1": _conv(sd, f"t2u_model.decoder.layers.{i}.conv1d.conv1"),
        "conv2": _conv(sd, f"t2u_model.decoder.layers.{i}.conv1d.conv2"),
        "conv_layer_norm": _ln(sd, f"t2u_model.decoder.layers.{i}.conv1d_layer_norm"),
    } for i in range(n)]
    # FiLM (expressive) must be injected BEFORE stacking — every layer carries
    # it in expressivity checkpoints, so the stacked tree keeps the key
    for i in range(n):
        fp = f"t2u_model.decoder.layers.{i}.film"
        if f"{fp}.proj.weight" in sd:
            dec_layers[i]["film"] = _film(sd, fp)
    vp = "t2u_model.decoder_frontend.variance_adaptor.duration_predictor"
    p = {
        "encoder": enc["stack"],
        "embed_char": _embed(sd, "t2u_model.decoder_frontend.embed_char"),
        "pos_emb_alpha_char": np.asarray(
            sd.get("t2u_model.decoder_frontend.pos_emb_alpha_char", np.ones(1))),
        "pos_emb_alpha": np.asarray(
            sd.get("t2u_model.decoder_frontend.pos_emb_alpha", np.ones(1))),
        "duration_predictor": {
            "conv1": _conv(sd, f"{vp}.conv1.0") if f"{vp}.conv1.0.weight" in sd
            else _conv(sd, f"{vp}.conv1"),
            "ln1": _ln(sd, f"{vp}.ln1"),
            "conv2": _conv(sd, f"{vp}.conv2.0") if f"{vp}.conv2.0.weight" in sd
            else _conv(sd, f"{vp}.conv2"),
            "ln2": _ln(sd, f"{vp}.ln2"),
            "proj": _linear(sd, f"{vp}.proj"),
        },
        "decoder_layers": _stack(dec_layers),
        "layer_norm": _ln(sd, "t2u_model.decoder.layer_norm"),
        "final_proj": _linear(sd, "t2u_model.final_proj"),
    }
    if f"{vp}.film.proj.weight" in sd:
        p["duration_predictor"]["film"] = _film(sd, f"{vp}.film")
    if "t2u_model.prosody_proj.weight" in sd:
        p["prosody_proj"] = _linear(sd, "t2u_model.prosody_proj")
    return p


def _film(sd, prefix: str) -> dict:
    return {"proj": _linear(sd, f"{prefix}.proj"),
            "s_gamma": np.asarray(sd[f"{prefix}.s_gamma"]),
            "s_beta": np.asarray(sd[f"{prefix}.s_beta"])}


def _ar_t2u_tree(sd) -> dict:
    """AR T2U (v1): standard enc-dec over the unit vocab with tied final proj
    (reference models/unity/model.py:263-327; keys converted by the
    synthesizer_encoder/decoder rules, loader.py:286-389)."""
    dec = _decoder_tree(sd, "t2u_model.decoder", "t2u_model.decoder_frontend.embed")
    p = {"embed": dec["embed"], "decoder": dec["stack"]}
    if "t2u_model.encoder.layer_norm.weight" in sd:
        enc = _encoder_tree(sd, "t2u_model.encoder",
                            "t2u_model.decoder_frontend.embed")
        p["encoder"] = enc["stack"]
    return p


# ---------------------------------------------------------------------------
# monotonic decoder
# ---------------------------------------------------------------------------

def monotonic_fairseq1_to_fairseq2(
        state_dict: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """fairseq1 'decoder.*'-keyed monotonic (EMMA) checkpoint -> fairseq2 key
    space, reproducing ``convert_monotonic_checkpoint`` (reference
    monotonic_decoder/loader.py:22-77): the key remap (energy-layer renames
    BEFORE the generic encoder_attn rule — first match wins), the NLLB-100
    dummy-row drop, the tied embedding from final_proj, and the control-symbol
    permutation (BOS,PAD,EOS,UNK)->(PAD,UNK,BOS,EOS) of the first four rows."""
    rules = [
        (r"^decoder\.embed_tokens\.", "text_decoder_frontend.embed."),
        (r"^decoder\.layers\.([0-9]+)\.self_attn\.out_proj\.",
         r"text_decoder.layers.\1.self_attn.output_proj."),
        (r"^decoder\.layers\.([0-9]+)\.self_attn\.",
         r"text_decoder.layers.\1.self_attn."),
        (r"^decoder\.layers\.([0-9]+)\.self_attn_layer_norm\.",
         r"text_decoder.layers.\1.self_attn_layer_norm."),
        (r"^decoder\.layers\.([0-9]+)\.encoder_attn\.out_proj\.",
         r"text_decoder.layers.\1.encoder_decoder_attn.output_proj."),
        (r"^decoder\.layers\.([0-9]+)\.encoder_attn\.energy_bias",
         r"text_decoder.layers.\1.p_choose_layer.energy_bias"),
        (r"^decoder\.layers\.([0-9]+)\.encoder_attn\.source_energy_layer\.",
         r"text_decoder.layers.\1.p_choose_layer.k_energy_proj."),
        (r"^decoder\.layers\.([0-9]+)\.encoder_attn\.target_energy_layer\.",
         r"text_decoder.layers.\1.p_choose_layer.q_energy_proj."),
        (r"^decoder\.layers\.([0-9]+)\.encoder_attn\.",
         r"text_decoder.layers.\1.encoder_decoder_attn."),
        (r"^decoder\.layers\.([0-9]+)\.encoder_attn_layer_norm\.",
         r"text_decoder.layers.\1.encoder_decoder_attn_layer_norm."),
        (r"^decoder\.layers\.([0-9]+)\.fc1\.",
         r"text_decoder.layers.\1.ffn.inner_proj."),
        (r"^decoder\.layers\.([0-9]+)\.fc2\.",
         r"text_decoder.layers.\1.ffn.output_proj."),
        (r"^decoder\.layers\.([0-9]+)\.final_layer_norm\.",
         r"text_decoder.layers.\1.ffn_layer_norm."),
        (r"^decoder\.layer_norm\.", "text_decoder.layer_norm."),
        (r"^decoder\.output_projection\.", "final_proj."),
    ]
    out: Dict[str, np.ndarray] = {}
    compiled = [(re.compile(p), r) for p, r in rules]
    for key, val in state_dict.items():
        for rx, repl in compiled:
            if rx.match(key):
                out[rx.sub(repl, key)] = np.asarray(val)
                break
        # unmatched (versions, _float_tensor, ...) dropped
    embeds = np.array(out["final_proj.weight"])
    if embeds.shape[0] == 256103:  # NLLB-100 dummy token
        embeds = embeds[:-1]
    # (BOS, PAD, EOS, UNK) -> (PAD, UNK, BOS, EOS)
    embeds[[0, 1, 2, 3]] = embeds[[1, 3, 0, 2]]
    out["final_proj.weight"] = embeds
    out["text_decoder_frontend.embed.weight"] = embeds
    return out


def monotonic_tree_from_pt(sd: Mapping[str, np.ndarray]) -> dict:
    """Monotonic decoder .pt in either key space -> param tree; detects
    fairseq2-native checkpoints the same way the reference does
    (monotonic_decoder/loader.py:28)."""
    if "text_decoder.layers.0.self_attn.k_proj.weight" not in sd:
        sd = monotonic_fairseq1_to_fairseq2(sd)
    return monotonic_tree_from_fairseq2(sd)


def monotonic_tree_from_fairseq2(sd: Mapping[str, np.ndarray]) -> dict:
    n = _num_layers(sd, r"text_decoder\.layers\.([0-9]+)\.")
    layers = []
    for i in range(n):
        p = f"text_decoder.layers.{i}"
        pc = f"{p}.p_choose_layer"
        q_layers = sorted({int(m.group(1)) for k in sd
                           if (m := re.match(rf"{re.escape(pc)}\.q_energy_proj\.layers\.([0-9]+)\.weight$", k))})
        layers.append({
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "cross_attn_layer_norm": _ln(sd, f"{p}.encoder_decoder_attn_layer_norm"),
            "cross_attn": _mha(sd, f"{p}.encoder_decoder_attn"),
            "p_choose": {
                "energy_bias": np.asarray(sd[f"{pc}.energy_bias"]).reshape(1),
                "q_energy_proj": [_linear(sd, f"{pc}.q_energy_proj.layers.{j}")
                                  for j in q_layers],
                "k_energy_proj": [_linear(sd, f"{pc}.k_energy_proj.layers.{j}")
                                  for j in q_layers],
            },
            "ffn": {"layer_norm": _ln(sd, f"{p}.ffn_layer_norm"),
                    "inner_proj": _linear(sd, f"{p}.ffn.inner_proj"),
                    "output_proj": _linear(sd, f"{p}.ffn.output_proj")},
        })
    embeds = np.asarray(sd["final_proj.weight"])
    return {"embed": {"embedding": embeds},
            "layers": _stack(layers),
            "layer_norm": _ln(sd, "text_decoder.layer_norm")}


# ---------------------------------------------------------------------------
# unit HiFi-GAN vocoder (.pt with raw speech-resynthesis keys)
# ---------------------------------------------------------------------------

def vocoder_tree_from_pt(sd: Mapping[str, np.ndarray]) -> dict:
    """Keys: code_generator.{dict,spkr,lang,dur_predictor,conv_pre,ups,resblocks,
    conv_post} with weight-norm g/v pairs (vocoder/loader.py:20-37)."""
    g = "code_generator"

    def conv_wn(prefix, transpose=False):
        if f"{prefix}.weight_g" in sd:
            w = _fold_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
        else:
            w = np.asarray(sd[f"{prefix}.weight"])
        w = _convT_w(w) if transpose else _conv_w(w)
        p = {"weight": w}
        if f"{prefix}.bias" in sd:
            p["bias"] = np.asarray(sd[f"{prefix}.bias"])
        return p

    n_ups = _num_layers(sd, rf"{g}\.ups\.([0-9]+)\.")
    n_res = _num_layers(sd, rf"{g}\.resblocks\.([0-9]+)\.")
    resblocks = []
    for i in range(n_res):
        n_c = _num_layers(sd, rf"{g}\.resblocks\.{i}\.convs1\.([0-9]+)\.")
        resblocks.append({
            "convs1": [conv_wn(f"{g}.resblocks.{i}.convs1.{j}") for j in range(n_c)],
            "convs2": [conv_wn(f"{g}.resblocks.{i}.convs2.{j}") for j in range(n_c)],
        })
    dp = f"{g}.dur_predictor"
    params = {
        "unit_embedding": _embed(sd, f"{g}.dict"),
        "speaker_embedding": _embed(sd, f"{g}.spkr"),
        "language_embedding": _embed(sd, f"{g}.lang"),
        "dur_predictor": {
            "conv1": _conv(sd, f"{dp}.conv1.0"),
            "ln1": _ln(sd, f"{dp}.ln1"),
            "conv2": _conv(sd, f"{dp}.conv2.0"),
            "ln2": _ln(sd, f"{dp}.ln2"),
            "proj": _linear(sd, f"{dp}.proj"),
        },
        "hifigan": {
            "conv_pre": conv_wn(f"{g}.conv_pre"),
            "upsampler": [conv_wn(f"{g}.ups.{i}", transpose=True)
                          for i in range(n_ups)],
            "resblocks": resblocks,
            "conv_post": conv_wn(f"{g}.conv_post"),
        },
    }
    return params


# ---------------------------------------------------------------------------
# ECAPA-TDNN (prosody/speaker encoder; reference models/generator/ecapa_tdnn.py)
# ---------------------------------------------------------------------------

def ecapa_tree_from_fairseq2(sd: Mapping[str, np.ndarray], *,
                             prefix: str = "prosody_encoder_model") -> dict:
    """Keys: {prefix}.blocks.0 (TDNN), blocks.1..N (SERes2Net: tdnn1,
    res2net_block.blocks.j, tdnn2, se_block.conv1/2, shortcut?), mfa,
    asp.{tdnn,conv}, asp_norm, fc — mapped onto models/pretssel/ecapa_tdnn.py's
    pytree."""
    def tdnn(p):
        return {"conv": _conv(sd, f"{p}.conv"), "norm": _ln(sd, f"{p}.norm")}

    n_blocks = _num_layers(sd, rf"{re.escape(prefix)}\.blocks\.([0-9]+)\.")
    blocks = [tdnn(f"{prefix}.blocks.0")]
    for i in range(1, n_blocks):
        p = f"{prefix}.blocks.{i}"
        n_r = _num_layers(sd, rf"{re.escape(p)}\.res2net_block\.blocks\.([0-9]+)\.")
        b = {
            "tdnn1": tdnn(f"{p}.tdnn1"),
            "res2net": {"blocks": [tdnn(f"{p}.res2net_block.blocks.{j}")
                                   for j in range(n_r)]},
            "tdnn2": tdnn(f"{p}.tdnn2"),
            "se": {"conv1": _conv(sd, f"{p}.se_block.conv1"),
                   "conv2": _conv(sd, f"{p}.se_block.conv2")},
        }
        if f"{p}.shortcut.weight" in sd:
            b["shortcut"] = _conv(sd, f"{p}.shortcut")
        blocks.append(b)
    return {
        "blocks": blocks,
        "mfa": tdnn(f"{prefix}.mfa"),
        "asp_tdnn": tdnn(f"{prefix}.asp.tdnn"),
        "asp_conv": _conv(sd, f"{prefix}.asp.conv"),
        "asp_norm": _ln(sd, f"{prefix}.asp_norm"),
        "fc": _conv(sd, f"{prefix}.fc"),
    }


# ---------------------------------------------------------------------------
# PRETSSEL expressive vocoder (reference models/generator/vocoder.py; the
# checkpoint stores fairseq2 module paths directly, generator/loader.py:24-29)
# ---------------------------------------------------------------------------

def _fft_layers_tree(sd, prefix: str) -> tuple:
    """FeedForwardTransformer: layers.N.{self_attn, self_attn_layer_norm,
    conv1d.conv1/conv2, conv1d_layer_norm, film} (+ final layer_norm only for
    norm_order PRE — the NAR T2U; PRETSSEL builds with POST and has none,
    reference generator/builder.py:304 vs t2u_builder.py:645)."""
    n = _num_layers(sd, rf"{re.escape(prefix)}\.layers\.([0-9]+)\.")
    layers = []
    for i in range(n):
        p = f"{prefix}.layers.{i}"
        lp = {
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "self_attn_layer_norm": _ln(sd, f"{p}.self_attn_layer_norm"),
            "conv1": _conv(sd, f"{p}.conv1d.conv1"),
            "conv2": _conv(sd, f"{p}.conv1d.conv2"),
            "conv_layer_norm": _ln(sd, f"{p}.conv1d_layer_norm"),
        }
        if f"{p}.film.proj.weight" in sd:
            lp["film"] = _film(sd, f"{p}.film")
        layers.append(lp)
    norm = (_ln(sd, f"{prefix}.layer_norm")
            if f"{prefix}.layer_norm.weight" in sd else None)
    return layers, norm


def _variance_predictor_tree(sd, prefix: str) -> dict:
    p = {
        "conv1": _conv(sd, f"{prefix}.conv1.0") if f"{prefix}.conv1.0.weight" in sd
        else _conv(sd, f"{prefix}.conv1"),
        "ln1": _ln(sd, f"{prefix}.ln1"),
        "conv2": _conv(sd, f"{prefix}.conv2.0") if f"{prefix}.conv2.0.weight" in sd
        else _conv(sd, f"{prefix}.conv2"),
        "ln2": _ln(sd, f"{prefix}.ln2"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }
    if f"{prefix}.film.proj.weight" in sd:
        p["film"] = _film(sd, f"{prefix}.film")
    return p


def _conv_wn(sd, prefix: str, *, transpose: bool = False) -> dict:
    if f"{prefix}.weight_g" in sd:
        w = _fold_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    else:
        w = np.asarray(sd[f"{prefix}.weight"])
    p = {"weight": _convT_w(w) if transpose else _conv_w(w)}
    if f"{prefix}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return p


def _lstm_tree(sd, prefix: str) -> list:
    """torch LSTM -> list of {"wx": {weight,bias}, "wh": {weight}} with the two
    torch biases folded into one."""
    layers = []
    k = 0
    while f"{prefix}.weight_ih_l{k}" in sd:
        layers.append({
            "wx": {"weight": _lin_w(sd[f"{prefix}.weight_ih_l{k}"]),
                   "bias": np.asarray(sd[f"{prefix}.bias_ih_l{k}"])
                   + np.asarray(sd[f"{prefix}.bias_hh_l{k}"])},
            "wh": {"weight": _lin_w(sd[f"{prefix}.weight_hh_l{k}"])},
        })
        k += 1
    return layers


def pretssel_tree_from_pt(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """Build the models/pretssel/vocoder.py pytree from a PRETSSEL checkpoint.

    ``cfg`` is a PretsselConfig — needed to decode the reference's flat
    interleaved ``layers`` ModuleList (generator/vocoder.py:384-453): postnet
    convs first, then four SEANet chunks interleaved with HiFi-GAN conv_pre /
    upsamplers / resblocks / conv_post. gcmvn stats are card data, not
    checkpoint tensors — left at defaults for the caller to fill."""
    pn = cfg.pn_layers
    n_ups = len(cfg.hifigan.upsample_rates)
    n_k = len(cfg.hifigan.resblock_kernel_sizes)
    n_ratios = len(cfg.seanet.ratios)
    n_streams = 6 * n_ratios + 8
    chunk = n_streams // 4

    def li(s: int) -> str:
        """stream_layers position -> self.layers index (vocoder.py:386-453)."""
        if s < chunk:
            idx = pn + s
        elif s < 2 * chunk:
            idx = pn + 1 + s
        elif s < 3 * chunk:
            idx = pn + 1 + n_ups + s
        else:
            idx = pn + 1 + n_ups + n_ups * n_k + s
        return f"layers.{idx}"

    def sconv(s: int) -> dict:         # StreamableConv1d
        return _conv_wn(sd, f"{li(s)}.conv.conv")

    def sconvtr(s: int) -> dict:       # StreamableConvTranspose1d
        return _conv_wn(sd, f"{li(s)}.convtr.convtr", transpose=True)

    def sres(s: int) -> dict:          # StreamableResnetBlock
        p = {"conv1": _conv_wn(sd, f"{li(s)}.block.1.conv.conv"),
             "conv2": _conv_wn(sd, f"{li(s)}.block.3.conv.conv")}
        if f"{li(s)}.shortcut.conv.conv.weight" in sd:
            p["shortcut"] = _conv_wn(sd, f"{li(s)}.shortcut.conv.conv")
        return p

    seanet: dict = {"enc_in": sconv(0), "enc_blocks": [], "dec_blocks": []}
    for bi in range(n_ratios):
        seanet["enc_blocks"].append({"res": sres(1 + 3 * bi),
                                     "down": sconv(3 + 3 * bi)})
    seanet["enc_lstm"] = _lstm_tree(sd, f"{li(1 + 3 * n_ratios)}.lstm")
    seanet["enc_out"] = sconv(3 + 3 * n_ratios)
    seanet["dec_in"] = sconv(4 + 3 * n_ratios)
    seanet["dec_lstm"] = _lstm_tree(sd, f"{li(5 + 3 * n_ratios)}.lstm")
    for bi in range(n_ratios):
        seanet["dec_blocks"].append({"up": sconvtr(7 + 3 * n_ratios + 3 * bi),
                                     "res": sres(8 + 3 * n_ratios + 3 * bi)})
    seanet["dec_out"] = sconv(7 + 6 * n_ratios)

    postnet = []
    for i in range(pn):
        # Sequential(Conv1d, BatchNorm1d, [Tanh], Dropout) -> conv + folded BN
        postnet.append({"conv": _conv(sd, f"layers.{i}.0"),
                        "norm": _bn_fold(sd, f"layers.{i}.1")})

    resblocks = []
    for i in range(n_ups):
        for j in range(n_k):
            p = f"layers.{pn + 3 * chunk + n_ups + 1 + i * n_k + j}"
            n_c = _num_layers(sd, rf"{re.escape(p)}\.convs1\.([0-9]+)\.")
            resblocks.append({
                "convs1": [_conv_wn(sd, f"{p}.convs1.{c}") for c in range(n_c)],
                "convs2": [_conv_wn(sd, f"{p}.convs2.{c}") for c in range(n_c)],
            })
    hifigan = {
        "conv_pre": _conv_wn(sd, f"layers.{pn + chunk}"),
        "upsampler": [_conv_wn(sd, f"layers.{pn + 2 * chunk + 1 + i}",
                               transpose=True) for i in range(n_ups)],
        "resblocks": resblocks,
        "conv_post": _conv_wn(
            sd, f"layers.{pn + n_streams + n_ups * (1 + n_k) + 1}"),
    }

    enc_layers, enc_norm = _fft_layers_tree(sd, "encoder")
    dec_layers, dec_norm = _fft_layers_tree(sd, "decoder")
    # variance adaptor: NO duration predictor (generator/builder.py:392-403);
    # pitch/vuv/energy predictors + 1x1-conv embeds
    va = "decoder_frontend.variance_adaptor"
    params = {
        "prosody_encoder": ecapa_tree_from_fairseq2(
            sd, prefix="encoder_frontend.prosody_encoder"),
        "embed_tokens": _embed(sd, "encoder_frontend.embed_tokens"),
        "embed_lang": _embed(sd, "encoder_frontend.embed_lang"),
        "pos_emb_alpha_enc": np.asarray(sd["encoder_frontend.pos_emb_alpha"]),
        "pos_emb_alpha_dec": np.asarray(sd["decoder_frontend.pos_emb_alpha"]),
        "encoder_layers": enc_layers,
        "pitch_predictor": _variance_predictor_tree(sd, f"{va}.pitch_predictor"),
        "embed_pitch": _conv(sd, f"{va}.embed_pitch"),
        "vuv_predictor": _variance_predictor_tree(sd, f"{va}.vuv_predictor"),
        "energy_predictor": _variance_predictor_tree(
            sd, f"{va}.energy_predictor"),
        "embed_energy": _conv(sd, f"{va}.embed_energy"),
        "decoder_layers": dec_layers,
        "final_proj": _linear(sd, "final_proj"),
        "postnet": postnet,
        "hifigan": hifigan,
        "seanet": seanet,
        "mean": np.asarray(sd["mean"]),
        "scale": np.asarray(sd["scale"]),
        "gcmvn_mean": np.zeros_like(np.asarray(sd["mean"])),
        "gcmvn_std": np.ones_like(np.asarray(sd["scale"])),
    }
    return params


# ---------------------------------------------------------------------------
# UnitY2 forced aligner (reference models/aligner/loader.py:22-75)
# ---------------------------------------------------------------------------

def aligner_tree_from_pt(ckpt: Mapping, *,
                         char_spm_pieces: Optional[Sequence[str]] = None) -> dict:
    """Accepts either the raw checkpoint (text_emb_state / unit_emb_state /
    aligner_state sub-dicts) or an already-converted flat dict. Applies the
    char-embedding reorder to sorted-SPM order (loader.py:52-56,61-75)."""
    if "aligner_state" in ckpt:
        sd = {f"alignment_encoder.{k}": np.asarray(v)
              for k, v in ckpt["aligner_state"].items()}
        sd["alignment_frontend.embed_text.weight"] = np.asarray(
            ckpt["text_emb_state"]["weight"])
        sd["alignment_frontend.embed_unit.weight"] = np.asarray(
            ckpt["unit_emb_state"]["weight"])
    else:
        sd = {k: np.asarray(v) for k, v in (ckpt.get("model") or ckpt).items()}

    te = np.asarray(sd["alignment_frontend.embed_text.weight"]).copy()
    if char_spm_pieces is not None:
        spm_order = list(char_spm_pieces)[4:]
        spm_to_dict = {ch: i for i, ch in enumerate(sorted(spm_order), start=4)}
        mapping = [0, 1, 2, 3] + [spm_to_dict[ch] for ch in spm_order]
        te[np.arange(len(mapping))] = te[mapping]

    def tower(name: str) -> List[dict]:
        # Sequential slots: conv at 1+3i (conv,relu,dropout / conv,dropout,permute)
        idx = sorted({int(m.group(1)) for k in sd
                      if (m := re.match(
                          rf"alignment_encoder\.{name}\.([0-9]+)\.weight$", k))})
        return [_conv(sd, f"alignment_encoder.{name}.{i}") for i in idx]

    return {
        "embed_text": {"embedding": te},
        "embed_unit": {"embedding": np.asarray(
            sd["alignment_frontend.embed_unit.weight"])},
        "t_conv": tower("t_conv"),
        "f_conv": tower("f_conv"),
    }


# ---------------------------------------------------------------------------
# MuToX classifier (reference toxicity/mutox/{builder.py:44-64,loader.py:27-35}:
# Sequential((Dropout,Linear 1024->512),(ReLU,Linear 512->128),(ReLU,Linear
# 128->1)) under model_all.N.1 keys)
# ---------------------------------------------------------------------------

def mutox_tree_from_pt(sd: Mapping[str, np.ndarray]) -> dict:
    n = _num_layers(sd, r"model_all\.([0-9]+)\.")
    return {"layers": [{"linear": _linear(sd, f"model_all.{i}.1")}
                       for i in range(n)]}


# ---------------------------------------------------------------------------
# XLSR wav2vec2 (unit extractor; reference wav2vec2_layer_output.py:23-52 via
# fairseq2's wav2vec2 loader key map)
# ---------------------------------------------------------------------------

_W2V2_RAW_RULES = [
    (r"^encoder\.pos_conv\.0\.", "encoder_frontend.pos_encoder.conv."),
    (r"^layer_norm\.", "encoder_frontend.post_extract_layer_norm."),
    (r"^post_extract_proj\.", "encoder_frontend.model_dim_proj."),
    (r"^feature_extractor\.conv_layers\.([0-9]+)\.0\.",
     r"encoder_frontend.feature_extractor.layers.\1.conv."),
    (r"^feature_extractor\.conv_layers\.([0-9]+)\.2\.1\.",
     r"encoder_frontend.feature_extractor.layers.\1.layer_norm."),
    (r"^encoder\.layers\.([0-9]+)\.self_attn\.out_proj\.",
     r"encoder.layers.\1.self_attn.output_proj."),
    (r"^encoder\.layers\.([0-9]+)\.self_attn\.",
     r"encoder.layers.\1.self_attn."),
    (r"^encoder\.layers\.([0-9]+)\.self_attn_layer_norm\.",
     r"encoder.layers.\1.self_attn_layer_norm."),
    (r"^encoder\.layers\.([0-9]+)\.fc1\.", r"encoder.layers.\1.ffn.inner_proj."),
    (r"^encoder\.layers\.([0-9]+)\.fc2\.", r"encoder.layers.\1.ffn.output_proj."),
    (r"^encoder\.layers\.([0-9]+)\.final_layer_norm\.",
     r"encoder.layers.\1.ffn_layer_norm."),
    (r"^encoder\.layer_norm\.", "encoder.layer_norm."),
    (r"^encoder_frontend\.", "encoder_frontend."),   # fairseq2-native passthrough
    (r"^encoder\.", "encoder."),
]


def wav2vec2_raw_tree_from_pt(sd: Mapping[str, np.ndarray]) -> dict:
    """fairseq1 or fairseq2 wav2vec2 keys -> models/unit_extractor/wav2vec2_raw
    pytree (frontend + encoder only; quantizer/final_proj pretraining heads are
    dropped, mirroring Wav2Vec2LayerOutputModel)."""
    f2: Dict[str, np.ndarray] = {}
    compiled = [(re.compile(p), r) for p, r in _W2V2_RAW_RULES]
    for key, val in sd.items():
        key = key.removeprefix("w2v_encoder.w2v_model.")
        for rx, repl in compiled:
            if rx.match(key):
                f2[rx.sub(repl, key)] = np.asarray(val)
                break

    fe = "encoder_frontend.feature_extractor.layers"
    n_convs = _num_layers(f2, rf"{re.escape(fe)}\.([0-9]+)\.")
    convs = [{"conv": _conv(f2, f"{fe}.{i}.conv"),
              "norm": _ln(f2, f"{fe}.{i}.layer_norm")} for i in range(n_convs)]

    pc = "encoder_frontend.pos_encoder.conv"
    pos_conv = _conv_wn(f2, pc)

    n = _num_layers(f2, r"encoder\.layers\.([0-9]+)\.")
    layers = [{
        "self_attn_layer_norm": _ln(f2, f"encoder.layers.{i}.self_attn_layer_norm"),
        "self_attn": _mha(f2, f"encoder.layers.{i}.self_attn"),
        "ffn": {"layer_norm": _ln(f2, f"encoder.layers.{i}.ffn_layer_norm"),
                "inner_proj": _linear(f2, f"encoder.layers.{i}.ffn.inner_proj"),
                "output_proj": _linear(f2, f"encoder.layers.{i}.ffn.output_proj")},
    } for i in range(n)]

    return {
        "feature_extractor": convs,
        "post_extract_norm": _ln(f2, "encoder_frontend.post_extract_layer_norm"),
        "post_extract_proj": _linear(f2, "encoder_frontend.model_dim_proj"),
        "pos_conv": pos_conv,
        "encoder_norm": _ln(f2, "encoder.layer_norm"),
        "layers": _stack(layers),
    }


# fairseq1 conformer-shaw (w2v-BERT pretraining) -> fairseq2 paths, mirroring
# reference models/conformer_shaw/loader.py:44-74 convert_conformer_shaw_checkpoint
_CONFORMER_SHAW_RULES = [
    (r"^encoder\.layers\.([0-9]+)\.self_attn\.out_proj\.",
     r"encoder.layers.\1.self_attn.output_proj."),
    (r"^encoder\.layers\.([0-9]+)\.self_attn\.rel_k_embedding\.",
     r"encoder.layers.\1.self_attn.sdpa.rel_k_embed."),
    (r"^encoder\.layers\.([0-9]+)\.conv_module\.depthwise_conv\.",
     r"encoder.layers.\1.conv.depthwise_conv."),
    (r"^encoder\.layers\.([0-9]+)\.conv_module\.layer_norm2\.",
     r"encoder.layers.\1.conv.layer_norm."),
    (r"^encoder\.layers\.([0-9]+)\.conv_module\.layer_norm\.",
     r"encoder.layers.\1.conv_layer_norm."),
    (r"^encoder\.layers\.([0-9]+)\.conv_module\.pointwise_conv1\.",
     r"encoder.layers.\1.conv.pointwise_conv1."),
    (r"^encoder\.layers\.([0-9]+)\.conv_module\.pointwise_conv2\.",
     r"encoder.layers.\1.conv.pointwise_conv2."),
    (r"^encoder\.layers\.([0-9]+)\.ffn(1|2)\.layer_norm\.",
     r"encoder.layers.\1.ffn\2_layer_norm."),
    (r"^encoder\.layers\.([0-9]+)\.ffn(1|2)\.w_1\.",
     r"encoder.layers.\1.ffn\2.inner_proj."),
    (r"^encoder\.layers\.([0-9]+)\.ffn(1|2)\.w_2\.",
     r"encoder.layers.\1.ffn\2.output_proj."),
    (r"^encoder\.layers\.([0-9]+)\.final_layer_norm\.",
     r"encoder.layers.\1.layer_norm."),
    (r"^layer_norm\.", "encoder_frontend.post_extract_layer_norm."),
    (r"^post_extract_proj\.", "encoder_frontend.model_dim_proj."),
    # fairseq2-native checkpoints pass through unchanged
    (r"^encoder_frontend\.", "encoder_frontend."),
    (r"^encoder\.", "encoder."),
]

# pretraining-only tensors with no inference use (masker/quantizer/target proj,
# reference loader.py:33-41 deletes the mlm head the same way)
_CONFORMER_SHAW_DROP = re.compile(
    r"^(mask_emb|quantizer\.|project_q\.|mlm_proj\.|final_target_proj\.|masker\.)")


def conformer_shaw_tree_from_pt(sd: Mapping[str, np.ndarray]) -> dict:
    """Standalone conformer-shaw speech-encoder checkpoint (fairseq1 w2v-BERT
    names or fairseq2 names; card cards/conformer_shaw.yaml) -> the
    ``speech_encoder`` sub-tree pieces shared with UnitY:
    {"feature_projection", "encoder"}. Used as pretrained init for finetuning
    (reference models/conformer_shaw/loader.py:1-92, m4t finetune from
    wav2vec2 init)."""
    f2: Dict[str, np.ndarray] = {}
    compiled = [(re.compile(p), r) for p, r in _CONFORMER_SHAW_RULES]
    for key, val in sd.items():
        if _CONFORMER_SHAW_DROP.match(key):
            continue
        for rx, repl in compiled:
            if rx.match(key):
                f2[rx.sub(repl, key)] = np.asarray(val)
                break

    n = _num_layers(f2, r"encoder\.layers\.([0-9]+)\.")
    if n == 0:
        raise ValueError("no conformer encoder layers found in checkpoint")
    layers = [_conformer_layer_tree(f2, f"encoder.layers.{i}") for i in range(n)]
    return {
        "feature_projection": {
            "layer_norm": _ln(f2, "encoder_frontend.post_extract_layer_norm"),
            "projection": _linear(f2, "encoder_frontend.model_dim_proj"),
        },
        "encoder": _stack(layers),
    }


def init_speech_encoder_from_conformer_shaw(params: dict, sd: Mapping[str, np.ndarray],
                                            *, dtype=None) -> dict:
    """Overwrite ``params['speech_encoder']``'s frontend projection + conformer
    stack with a converted standalone conformer-shaw checkpoint, keeping the
    UnitY-only adaptor/intermediate_ffn/inner_layer_norm at their current
    (fresh) values — the reference finetune's pretrained-encoder init."""
    import jax
    import jax.numpy as jnp

    tree = conformer_shaw_tree_from_pt(sd)
    se = dict(params["speech_encoder"])
    for key in ("feature_projection", "encoder"):
        new = tree[key]
        old = se[key]
        old_leaves = jax.tree.leaves(old)
        new_leaves = jax.tree.leaves(new)
        if len(old_leaves) != len(new_leaves) or any(
                tuple(a.shape) != tuple(np.shape(b))
                for a, b in zip(old_leaves, new_leaves)):
            raise ValueError(
                f"conformer_shaw checkpoint does not match model config at "
                f"'{key}' (layer count / dims)")
        if dtype is None:
            dtype = old_leaves[0].dtype
        se[key] = jax.tree.map(lambda a: jnp.asarray(a, dtype), new)
    out = dict(params)
    out["speech_encoder"] = se
    return out


def load_pt_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference checkpoint -> numpy state dict (model/generator key)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model") or ckpt.get("generator") or ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
