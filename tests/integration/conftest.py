"""Shared session-scoped tiny-model fixtures for integration tests.

Building (and jit-compiling through) a tiny Translator dominates test wall
time on this 1-core image — share one instance across test modules."""

import numpy as np
import pytest

import jax

from seamless_communication_tpu.inference.generator import (
    SequenceGeneratorOptions,
)
from seamless_communication_tpu.inference.translator import Translator
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
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL,
    TYPE_UNKNOWN,
)


@pytest.fixture(scope="session")
def translator_tiny():
    """tiny_v2 Translator with toy tokenizers + tiny unit HiFi-GAN vocoder."""
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


@pytest.fixture(scope="session")
def pretssel_tiny():
    """Tiny PRETSSEL (params, cfg) matching the expressive streaming tests."""
    from seamless_communication_tpu.models.pretssel.ecapa_tdnn import EcapaConfig
    from seamless_communication_tpu.models.pretssel.streamable import SeanetConfig
    from seamless_communication_tpu.models.pretssel.vocoder import (
        PretsselConfig, pretssel_init,
    )

    pcfg = PretsselConfig(
        num_units=112, model_dim=32, num_heads=2, ffn_inner_dim=64,
        conv_kernel_size=5, num_encoder_layers=1, num_decoder_layers=1,
        num_langs=4, lang_embed_dim=8, prosody_dim=16, pn_conv_dim=16,
        pn_layers=2, pn_kernel_size=5, var_pred_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=80, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)),
        seanet=SeanetConfig(dimension=16, n_filters=4, ratios=(4, 2), lstm=1),
        ecapa=EcapaConfig(channels=(16, 16, 16, 16, 32),
                          kernel_sizes=(5, 3, 3, 3, 1), dilations=(1, 2, 3, 4, 1),
                          attention_channels=8, res2net_scale=4, se_channels=8,
                          groups=(1,) * 5, embed_dim=16, input_dim=80))
    return pretssel_init(jax.random.PRNGKey(2), pcfg), pcfg
