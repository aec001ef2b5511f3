"""Tokenizer tests: SPM protobuf parse + Viterbi segmentation, NLLB conventions,
unit tokenizer vocab math (ports the reference's tests/unit/models/unity/test_unity.py
UnitTokenizer coverage, SURVEY.md §4.2)."""

import numpy as np
import pytest

from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model,
    TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)


@pytest.fixture(scope="module")
def toy_spm():
    pieces = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
              ("</s>", 0.0, TYPE_CONTROL)]
    vocab = ["▁hello", "▁world", "▁he", "llo", "▁wor", "ld", "▁", "h", "e", "l",
             "o", "w", "r", "d", "!", "▁the", "t", "▁a"]
    # longer pieces score better so Viterbi prefers them
    pieces += [(p, -1.0 * (20 - len(p)), TYPE_NORMAL) for p in vocab]
    return SentencePieceModel.from_bytes(build_spm_model(pieces))


def test_spm_roundtrip(toy_spm):
    ids = toy_spm.encode("hello world!")
    assert toy_spm.pieces[ids[0]] == "▁hello"
    assert toy_spm.decode(ids) == "hello world!"


def test_spm_prefers_best_segmentation(toy_spm):
    assert toy_spm.encode_as_pieces("hello") == ["▁hello"]
    assert toy_spm.encode_as_pieces("world") == ["▁world"]


def test_spm_unknown_char(toy_spm):
    ids = toy_spm.encode("hello Ω")
    assert toy_spm.unk_id in ids


def test_nllb_source_target_modes(toy_spm):
    tok = NllbTokenizer(toy_spm, langs=["__eng__", "__fra__"])
    src = tok.encode_source("hello world", "eng")
    assert src[0] == tok.lang_token("eng")
    assert src[-1] == 3  # eos
    assert tok.decode(src) == "hello world"
    pre = tok.target_prefix("fra")
    assert list(pre) == [3, tok.lang_token("fra")]
    assert tok.lang_token("fra") == tok.lang_token("eng") + 1
    # vocab layout: pad/unk/bos/eos then spm then langs
    assert tok.lang_token("eng") == len(toy_spm) + 1


def test_char_tokenizer(toy_spm):
    ct = CharTokenizer(toy_spm)
    ids = ct.encode_chars("hello")
    assert len(ids) == 5
    assert all(i >= 4 for i in ids)


# --- unit tokenizer: mirrors reference test coverage -------------------------

def test_unit_tokenizer_v1_vocab_math():
    t = UnitTokenizer(100, ["eng", "fra", "deu"], "base")
    assert t.vocab_size == 100 + 2 * 4 + 4
    assert t.lang_to_index("eng") == 100 + 4 + 4
    assert t.lang_to_index("deu") == 100 + 4 + 6
    assert t.index_to_lang(t.lang_to_index("fra")) == "fra"


def test_unit_tokenizer_v2_vocab_math():
    t = UnitTokenizer(100, ["eng", "fra", "deu"], "base_v2")
    assert t.vocab_size == 100 + 4 + 4
    assert t.lang_to_index("eng") == 104
    assert t.index_to_lang(105) == "fra"


def test_unit_tokenizer_ar_roundtrip():
    t = UnitTokenizer(100, ["eng"], "base")
    units = np.array([[5, 9, 50]])
    tok = t.encode(units, "eng")
    assert tok[0, 0] == t.eos_idx and tok[0, 1] == t.lang_to_index("eng")
    assert list(tok[0, 2:]) == [9, 13, 54]
    dec = t.decode(tok)
    # lang symbol kept at position 0, then raw units
    assert list(dec[0, 1:]) == [5, 9, 50]


def test_unit_tokenizer_nar_roundtrip():
    t = UnitTokenizer(100, ["eng"], "base_v2")
    units = np.array([[5, 9, 50]])
    tok = t.encode(units, "eng")
    assert list(tok[0]) == [9, 13, 54]
    dec = t.decode(tok)
    assert list(dec[0]) == [5, 9, 50]


def test_unit_tokenizer_nar_eos_to_pad():
    t = UnitTokenizer(100, ["eng"], "base_v2")
    tok = np.array([[9, t.eos_idx, 13]])
    dec = t.decode(tok)
    assert list(dec[0]) == [5, t.pad_idx, 9]
