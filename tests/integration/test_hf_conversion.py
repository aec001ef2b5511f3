"""End-to-end checkpoint-bridge validation: build a tiny random HF
SeamlessM4Tv2Model, convert with checkpoint/convert_hf.py, and compare full
sub-model forwards (speech encoder, text encoder/decoder logits) against the torch
oracle. This is exactly the path real checkpoints take through cli/loading.py."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.conftest import assert_close

torch.manual_seed(0)

DIM, HEADS = 64, 4


@pytest.fixture(scope="module")
def hf_model():
    from transformers import SeamlessM4Tv2Config, SeamlessM4Tv2Model
    cfg = SeamlessM4Tv2Config(
        hidden_size=DIM,
        vocab_size=300,
        t2u_vocab_size=120,
        char_vocab_size=60,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=HEADS, decoder_attention_heads=HEADS,
        encoder_ffn_dim=DIM * 2, decoder_ffn_dim=DIM * 2,
        speech_encoder_layers=2, speech_encoder_attention_heads=HEADS,
        speech_encoder_intermediate_size=DIM * 2,
        conv_depthwise_kernel_size=7,
        left_max_position_embeddings=8, right_max_position_embeddings=3,
        speech_encoder_dropout=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, speech_encoder_hidden_act="swish",
        adaptor_kernel_size=8, adaptor_stride=8, adaptor_dropout=0.0,
        num_adapter_layers=1, feature_projection_input_dim=160,
        t2u_encoder_layers=2, t2u_decoder_layers=2,
        t2u_encoder_attention_heads=HEADS, t2u_decoder_attention_heads=HEADS,
        t2u_encoder_ffn_dim=DIM * 2, t2u_decoder_ffn_dim=DIM * 2,
        t2u_variance_predictor_embed_dim=DIM, t2u_variance_predictor_hidden_dim=32,
        t2u_variance_predictor_kernel_size=3, t2u_variance_pred_dropout=0.0,
        speech_encoder_chunk_size=None, position_embeddings_type="relative_key",
        unit_hifi_gan_vocab_size=120,
        upsample_initial_channel=32, upsample_rates=[4, 2],
        upsample_kernel_sizes=[8, 4], resblock_kernel_sizes=[3],
        resblock_dilation_sizes=[[1, 2]], unit_embed_dim=32, lang_embed_dim=8,
        spkr_embed_dim=8, vocoder_num_langs=4, vocoder_num_spkrs=4,
        var_pred_dropout=0.0, max_position_embeddings=512,
    )
    return SeamlessM4Tv2Model(cfg).eval()


@pytest.fixture(scope="module")
def converted(hf_model):
    from seamless_communication_tpu.checkpoint.convert_hf import (
        convert_hf_seamless_m4t_v2, to_jax,
    )
    return to_jax(convert_hf_seamless_m4t_v2(hf_model))


@pytest.fixture(scope="module")
def my_cfg():
    from seamless_communication_tpu.models.nllb.model import NllbConfig
    from seamless_communication_tpu.models.unity.builder import UnitYConfig
    from seamless_communication_tpu.models.unity.t2u import NarT2UConfig
    from seamless_communication_tpu.models.wav2vec2.encoder import SpeechEncoderConfig
    from seamless_communication_tpu.ops.conformer import ConformerConfig
    return UnitYConfig(
        model_dim=DIM,
        speech=SpeechEncoderConfig(
            model_dim=DIM, feature_dim=160, ffn_inner_dim=DIM * 2,
            num_adaptor_heads=HEADS,
            conformer=ConformerConfig(dim=DIM, ffn_inner_dim=DIM * 2,
                                      num_heads=HEADS, num_layers=2,
                                      depthwise_kernel_size=7, pos_type="shaw",
                                      shaw_max_left=8, shaw_max_right=3)),
        nllb=NllbConfig(dim=DIM, num_encoder_layers=2, num_decoder_layers=2,
                        num_heads=HEADS, ffn_inner_dim=DIM * 2, vocab_size=300,
                        max_seq_len=512),
        nar_t2u=NarT2UConfig(model_dim=DIM, num_encoder_layers=2,
                             num_decoder_layers=2, num_heads=HEADS,
                             ffn_inner_dim=DIM * 2, unit_vocab_size=120,
                             char_vocab_size=60, dur_predictor_hidden=32),
        arch="tiny_hf")


def test_converted_speech_encoder_matches(hf_model, converted, my_cfg):
    from seamless_communication_tpu.models.unity import model as unity
    feats = torch.randn(1, 32, 160)
    with torch.no_grad():
        ref = hf_model.speech_encoder(input_features=feats).last_hidden_state
    fbank = jnp.asarray(feats.numpy()).reshape(1, 64, 80)
    enc = unity.encode_speech(converted, my_cfg, fbank, jnp.array([64]))
    assert_close(enc.seqs[:, :ref.shape[1]], ref.numpy(), atol=2e-3, rtol=1e-2)


def test_converted_text_decoder_logits_match(hf_model, converted, my_cfg):
    from seamless_communication_tpu.models.unity import model as unity
    B, S, T = 1, 9, 6
    enc_out = torch.randn(B, S, DIM)
    dec_ids = torch.randint(4, 300, (B, T))
    with torch.no_grad():
        dec = hf_model.text_decoder(input_ids=dec_ids,
                                    encoder_hidden_states=enc_out)
        ref_logits = hf_model.lm_head(dec.last_hidden_state)
    enc = unity.EncoderOutput(jnp.asarray(enc_out.numpy()),
                              jnp.full((B,), S, jnp.int32))
    feats = unity.decode_text(converted, my_cfg, jnp.asarray(dec_ids.numpy()), enc,
                              self_lengths=jnp.full((B,), T, jnp.int32))
    logits = unity.project(converted, feats)
    assert_close(logits, ref_logits.numpy(), atol=5e-3, rtol=1e-2)


def test_converted_text_encoder_matches(hf_model, converted, my_cfg):
    from seamless_communication_tpu.models.unity import model as unity
    ids = torch.randint(4, 300, (1, 7))
    with torch.no_grad():
        ref = hf_model.text_encoder(input_ids=ids).last_hidden_state
    enc = unity.encode_text(converted, my_cfg, jnp.asarray(ids.numpy()),
                            jnp.array([7], jnp.int32))
    assert_close(enc.seqs, ref.numpy(), atol=2e-3, rtol=1e-2)


def test_converted_vocoder_matches(hf_model):
    from seamless_communication_tpu.checkpoint.convert_hf import (
        convert_hf_code_hifigan, to_jax,
    )
    from seamless_communication_tpu.models.vocoder.codehifigan import (
        CodeHifiGanConfig, code_hifigan_forward,
    )
    from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig

    voc = hf_model.vocoder.eval()
    params = to_jax(convert_hf_code_hifigan(voc))
    cfg = CodeHifiGanConfig(
        num_units=120, unit_embed_dim=32, num_langs=4, lang_embed_dim=8,
        num_spkrs=4, spkr_embed_dim=8, dur_predictor_hidden=32,
        dur_predictor_kernel=3,
        hifigan=HifiGanConfig(model_in_dim=48, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)))
    units = torch.randint(0, 120, (1, 12))
    with torch.no_grad():
        # HF expects 2D (B, 1) id tensors here
        ref_wav, ref_lens = voc(input_ids=units, speaker_id=torch.tensor([[1]]),
                                lang_id=torch.tensor([[2]]))
    out = code_hifigan_forward(params, cfg, jnp.asarray(units.numpy()),
                               jnp.array([12]), jnp.array([2]), jnp.array([1]),
                               dur_prediction=True, max_unit_len=64)
    n = int(ref_wav.shape[-1])
    assert int(out.sample_lengths[0]) == n
    assert_close(out.waveform[0, :n], ref_wav[0].numpy(), atol=2e-3, rtol=1e-2)
