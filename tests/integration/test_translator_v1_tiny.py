"""v1 (AR T2U) end-to-end path: tiny_v1 arch through Translator.predict t2st —
exercises the XL-attention speech encoder and the AR unit beam search
(reference UnitYT2UModel, models/unity/model.py:263-327)."""

import numpy as np
import pytest

import jax

from seamless_communication_tpu.inference.generator import SequenceGeneratorOptions
from seamless_communication_tpu.inference.translator import Translator
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)


def test_v1_ar_t2st():
    cfg = get_arch("tiny_v1")
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc", "."] + ["▁"] + list("abc")
    tok = NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words])), langs=["__eng__"])
    unit_tok = UnitTokenizer(100, ["eng"], "base")   # AR: lang syms x2
    assert unit_tok.vocab_size <= cfg.ar_t2u.unit_vocab_size

    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    tr = Translator(params, cfg, tok, unit_tok,
                    text_opts=SequenceGeneratorOptions(
                        beam_size=2, soft_max_seq_len=(0, 8), hard_max_seq_len=8),
                    unit_opts=SequenceGeneratorOptions(
                        beam_size=2, soft_max_seq_len=(0, 24), hard_max_seq_len=24))
    texts, speech = tr.predict("aa bb cc", "t2st", "eng", src_lang="eng",
                               max_unit_len=32)
    assert len(texts) == 1
    assert speech is not None
    # AR beam search produced a raw unit list within the unit vocab
    assert all(0 <= u < 100 for u in speech.units[0])
