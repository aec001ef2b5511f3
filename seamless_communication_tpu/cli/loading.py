"""Model/tokenizer loading for the CLIs: asset card -> params + tokenizers.

Two checkpoint paths:
  1. HF checkpoints (facebook/seamless-m4t-v2-large, -vocoder etc.): load the torch
     model with transformers and convert (checkpoint/convert_hf.py). Preferred —
     the layout is already validated against the reference release.
  2. Original fairseq2 .pt files named in the reference cards: convert via
     checkpoint/convert_fairseq2.py.

Tokenizer files (sentencepiece .model) load through the native SPM implementation.
"""

from __future__ import annotations

import logging
from typing import Optional

from seamless_communication_tpu.assets import load_card, resolve_asset
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import SentencePieceModel

logger = logging.getLogger(__name__)

HF_REPO_FOR_CARD = {
    "seamlessM4T_v2_large": "facebook/seamless-m4t-v2-large",
    "seamlessM4T_large": "facebook/hf-seamless-m4t-large",
    "seamlessM4T_medium": "facebook/hf-seamless-m4t-medium",
}


def _unity_params_from_pt(pt_path: str, card: dict,
                          char_tok: Optional[CharTokenizer], dtype):
    """Original fairseq1/fairseq2 ``.pt`` -> param tree, with the reference's
    loader fixups (key remap, NLLB-100 drop, control-symbol permutation, char
    reorder — models/unity/loader.py:27-176)."""
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        apply_unity_fixups, fairseq1_to_fairseq2_auto, is_fairseq1_unity,
        load_pt_state_dict, unity_tree_from_fairseq2,
    )

    sd = load_pt_state_dict(pt_path)
    if is_fairseq1_unity(sd):
        sd = fairseq1_to_fairseq2_auto(sd)
        char_pieces = (["<pad>"] + list(char_tok.spm.pieces)
                       if char_tok is not None else None)
        sd = apply_unity_fixups(sd, char_spm_pieces=char_pieces)
    tree = unity_tree_from_fairseq2(sd, v2="v2" in card["model_arch"])
    return jax.tree.map(lambda a: jnp.asarray(a, dtype), tree)


def load_unity_model_and_tokenizers(card_name: str, *, dtype=None,
                                    local_hf_path: Optional[str] = None,
                                    local_pt_path: Optional[str] = None,
                                    quantize: bool = False,
                                    quantize_bits: int = 8):
    """-> (params, UnitYConfig, NllbTokenizer, UnitTokenizer, CharTokenizer|None).

    Checkpoint resolution order: explicit ``local_pt_path`` -> HF (explicit
    ``local_hf_path`` or the card's known HF repo) -> the card's original
    ``.pt`` checkpoint (gated dirs via SEAMLESS_GATED_ASSETS; required for
    SeamlessExpressive/SeamlessStreaming, which have no HF release)."""
    import jax.numpy as jnp

    card = load_card(card_name)
    cfg = get_arch(card["model_arch"])

    char_tok = None
    if "char_tokenizer" in card:
        char_tok = CharTokenizer.from_file(resolve_asset(card["char_tokenizer"]))

    src = local_hf_path or HF_REPO_FOR_CARD.get(card_name)
    if local_pt_path or src is None:
        pt = local_pt_path or card.get("checkpoint")
        if pt is None or (not local_pt_path and str(pt).endswith("gated=true")):
            raise ValueError(
                f"card {card_name} has no HF mapping and its checkpoint is "
                f"gated; pass local_pt_path / --gated-model-dir "
                f"(SEAMLESS_GATED_ASSETS) or local_hf_path")
        params = _unity_params_from_pt(resolve_asset(str(pt)), card, char_tok,
                                       dtype or jnp.bfloat16)
    else:
        from seamless_communication_tpu.checkpoint.convert_hf import (
            convert_hf_seamless_m4t_v2, to_jax,
        )
        if card["model_arch"].endswith("v2"):
            from transformers import SeamlessM4Tv2Model
            model = SeamlessM4Tv2Model.from_pretrained(src)
        else:
            from transformers import SeamlessM4TModel
            model = SeamlessM4TModel.from_pretrained(src)
        params = to_jax(convert_hf_seamless_m4t_v2(model), dtype or jnp.bfloat16)
    if quantize:
        from seamless_communication_tpu.ops.quantization import quantize_params
        params = quantize_params(params, bits=quantize_bits)

    # tokenizers
    spm_path = resolve_asset(card.get("tokenizer",
                                      f"{src}/sentencepiece.bpe.model"))
    langs = [f"__{l}__" for l in card.get("langs", [])] or None
    text_tok = NllbTokenizer(SentencePieceModel.from_file(spm_path),
                             langs=langs or [])
    unit_tok = UnitTokenizer(card.get("num_units", 10000),
                             card.get("unit_langs", []), card["model_arch"])
    return params, cfg, text_tok, unit_tok, char_tok


def load_monotonic_decoder(card_name: str = "seamless_streaming_monotonic_decoder",
                           *, dtype=None):
    """-> (mono_params, MonotonicDecoderConfig). Original torch ``.pt``
    (fairseq1 or fairseq2 keyed) converts via monotonic_tree_from_pt; anything
    else loads as this framework's serialized params."""
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig,
    )

    card = load_card(card_name)
    cfg = MonotonicDecoderConfig()   # dense_1b (the only released arch)
    path = resolve_asset(str(card["checkpoint"]))
    if path.endswith(".pt"):
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            load_pt_state_dict, monotonic_tree_from_pt,
        )
        tree = monotonic_tree_from_pt(load_pt_state_dict(path))
    else:
        from seamless_communication_tpu.checkpoint.serialize import load_params
        tree = load_params(path)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype or jnp.bfloat16),
                          tree)
    return params, cfg


def load_pretssel_vocoder(card_name: str = "vocoder_pretssel", *, dtype=None):
    """-> (voc_params, PretsselConfig, model_config dict, sample_rate).

    Resolves the card checkpoint; original torch ``.pt`` files (the gated
    pretssel_melhifigan_wm*.pt) convert via pretssel_tree_from_pt, anything
    else loads as this framework's serialized params. Config (16/24 kHz
    upsample stack) follows the card's sample_rate."""
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.pretssel.vocoder import (
        pretssel_16khz_config, pretssel_24khz_config,
    )

    card = load_card(card_name)
    sample_rate = int(card.get("sample_rate", 24000))
    cfg = pretssel_16khz_config() if sample_rate == 16000 \
        else pretssel_24khz_config()
    path = resolve_asset(str(card["checkpoint"]))
    if path.endswith(".pt"):
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            load_pt_state_dict, pretssel_tree_from_pt,
        )
        tree = pretssel_tree_from_pt(load_pt_state_dict(path), cfg)
    else:
        from seamless_communication_tpu.checkpoint.serialize import load_params
        tree = load_params(path)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype or jnp.float32), tree)
    return params, cfg, card.get("model_config") or {}, sample_rate


def load_vocoder(card_name: str = "vocoder_v2", *, dtype=None,
                 local_hf_path: Optional[str] = None,
                 local_pt_path: Optional[str] = None):
    """-> (voc_params, CodeHifiGanConfig, lang_spkr_idx_map).

    ``local_pt_path`` (or a locally-resolvable card checkpoint) loads the
    original unit HiFi-GAN ``.pt`` via vocoder_tree_from_pt; otherwise the HF
    v2 release's vocoder weights are used."""
    import jax
    import jax.numpy as jnp

    from seamless_communication_tpu.models.vocoder.codehifigan import CodeHifiGanConfig

    card = load_card(card_name)
    cfg = CodeHifiGanConfig()
    idx_map = (card.get("model_config") or {}).get("lang_spkr_idx_map", {})

    pt = local_pt_path
    if pt is None and not local_hf_path:
        # prefer an already-local original .pt (gated dir rewrite or cached
        # file) but never trigger a download here — HF is the default source
        import os

        ckpt = str(card.get("checkpoint", ""))
        if ckpt and not ckpt.endswith("gated=true"):
            cache = os.environ.get("SEAMLESS_CACHE",
                                   os.path.expanduser("~/.cache/seamless_tpu"))
            for cand in (ckpt,
                         os.path.join(cache, ckpt.rstrip("/").split("/")[-1])):
                if os.path.exists(cand):
                    pt = cand
                    break
    if pt is not None:
        from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
            load_pt_state_dict, vocoder_tree_from_pt,
        )
        tree = vocoder_tree_from_pt(load_pt_state_dict(pt))
        params = jax.tree.map(
            lambda a: jnp.asarray(a, dtype or jnp.float32), tree)
        return params, cfg, idx_map

    from seamless_communication_tpu.checkpoint.convert_hf import (
        convert_hf_code_hifigan, to_jax,
    )
    src = local_hf_path or "facebook/seamless-m4t-v2-large"
    from transformers import SeamlessM4Tv2Model
    model = SeamlessM4Tv2Model.from_pretrained(src)
    params = to_jax(convert_hf_code_hifigan(model.vocoder), dtype or jnp.float32)
    return params, cfg, idx_map
