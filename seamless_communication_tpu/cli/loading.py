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


def load_unity_model_and_tokenizers(card_name: str, *, dtype=None,
                                    local_hf_path: Optional[str] = None,
                                    quantize: bool = False):
    """-> (params, UnitYConfig, NllbTokenizer, UnitTokenizer, CharTokenizer|None)."""
    import jax.numpy as jnp

    from seamless_communication_tpu.checkpoint.convert_hf import (
        convert_hf_seamless_m4t_v2, to_jax,
    )

    card = load_card(card_name)
    cfg = get_arch(card["model_arch"])

    src = local_hf_path or HF_REPO_FOR_CARD.get(card_name)
    if src is None:
        raise ValueError(f"no HF mapping for card {card_name}; pass local_hf_path")

    if card["model_arch"].endswith("v2"):
        from transformers import SeamlessM4Tv2Model
        model = SeamlessM4Tv2Model.from_pretrained(src)
    else:
        from transformers import SeamlessM4TModel
        model = SeamlessM4TModel.from_pretrained(src)
    params = to_jax(convert_hf_seamless_m4t_v2(model), dtype or jnp.bfloat16)
    if quantize:
        from seamless_communication_tpu.ops.quantization import quantize_params
        params = quantize_params(params)

    # tokenizers
    spm_path = resolve_asset(card.get("tokenizer",
                                      f"{src}/sentencepiece.bpe.model"))
    langs = [f"__{l}__" for l in card.get("langs", [])] or None
    text_tok = NllbTokenizer(SentencePieceModel.from_file(spm_path),
                             langs=langs or [])
    unit_tok = UnitTokenizer(card.get("num_units", 10000),
                             card.get("unit_langs", []), card["model_arch"])
    char_tok = None
    if "char_tokenizer" in card:
        char_tok = CharTokenizer.from_file(resolve_asset(card["char_tokenizer"]))
    return params, cfg, text_tok, unit_tok, char_tok


def load_vocoder(card_name: str = "vocoder_v2", *, dtype=None,
                 local_hf_path: Optional[str] = None):
    """-> (voc_params, CodeHifiGanConfig, lang_spkr_idx_map)."""
    import jax.numpy as jnp

    from seamless_communication_tpu.checkpoint.convert_hf import (
        convert_hf_code_hifigan, to_jax,
    )
    from seamless_communication_tpu.models.vocoder.codehifigan import CodeHifiGanConfig

    card = load_card(card_name)
    src = local_hf_path or "facebook/seamless-m4t-v2-large"
    from transformers import SeamlessM4Tv2Model
    model = SeamlessM4Tv2Model.from_pretrained(src)
    params = to_jax(convert_hf_code_hifigan(model.vocoder), dtype or jnp.float32)
    cfg = CodeHifiGanConfig()
    idx_map = (card.get("model_config") or {}).get("lang_spkr_idx_map", {})
    return params, cfg, idx_map
