"""v1 checkpoint-bridge validation (the only model family without one in round
1): build a tiny random HF SeamlessM4TModel (v1: XL-rel-pos conformer with
batch-norm conv module, AR T2U), convert with convert_hf_seamless_m4t_v1, and
compare full sub-model forwards plus a greedy AR T2U decode against the torch
oracle (reference models/unity/model.py:263-327)."""

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
    from transformers import SeamlessM4TConfig, SeamlessM4TModel
    cfg = SeamlessM4TConfig(
        hidden_size=DIM,
        vocab_size=300,
        t2u_vocab_size=120,
        encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=HEADS, decoder_attention_heads=HEADS,
        encoder_ffn_dim=DIM * 2, decoder_ffn_dim=DIM * 2,
        speech_encoder_layers=2, speech_encoder_attention_heads=HEADS,
        speech_encoder_intermediate_size=DIM * 2,
        conv_depthwise_kernel_size=7,
        speech_encoder_dropout=0.0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0, speech_encoder_hidden_act="swish",
        adaptor_kernel_size=8, adaptor_stride=8, adaptor_dropout=0.0,
        num_adapter_layers=1, feature_projection_input_dim=160,
        t2u_encoder_layers=2, t2u_decoder_layers=2,
        t2u_encoder_attention_heads=HEADS, t2u_decoder_attention_heads=HEADS,
        t2u_encoder_ffn_dim=DIM * 2, t2u_decoder_ffn_dim=DIM * 2,
        position_embeddings_type="relative",
        unit_hifi_gan_vocab_size=120, upsample_initial_channel=32,
        upsample_rates=[4, 2], upsample_kernel_sizes=[8, 4],
        resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 2]],
        unit_embed_dim=32, lang_embed_dim=8, spkr_embed_dim=8,
        vocoder_num_langs=4, vocoder_num_spkrs=4, var_pred_dropout=0.0,
        max_position_embeddings=512,
    )
    return SeamlessM4TModel(cfg).eval()


@pytest.fixture(scope="module")
def converted(hf_model):
    from seamless_communication_tpu.checkpoint.convert_hf import (
        convert_hf_seamless_m4t_v1, to_jax,
    )
    return to_jax(convert_hf_seamless_m4t_v1(hf_model))


@pytest.fixture(scope="module")
def my_cfg():
    from seamless_communication_tpu.models.nllb.model import NllbConfig
    from seamless_communication_tpu.models.unity.builder import UnitYConfig
    from seamless_communication_tpu.models.unity.t2u import ArT2UConfig
    from seamless_communication_tpu.models.wav2vec2.encoder import SpeechEncoderConfig
    from seamless_communication_tpu.ops.conformer import ConformerConfig
    return UnitYConfig(
        model_dim=DIM,
        speech=SpeechEncoderConfig(
            model_dim=DIM, feature_dim=160, ffn_inner_dim=DIM * 2,
            num_adaptor_heads=HEADS,
            conformer=ConformerConfig(dim=DIM, ffn_inner_dim=DIM * 2,
                                      num_heads=HEADS, num_layers=2,
                                      depthwise_kernel_size=7, pos_type="xl",
                                      causal_depthwise_conv=False,
                                      conv_norm="batch_norm")),
        nllb=NllbConfig(dim=DIM, num_encoder_layers=2, num_decoder_layers=2,
                        num_heads=HEADS, ffn_inner_dim=DIM * 2, vocab_size=300,
                        max_seq_len=512),
        ar_t2u=ArT2UConfig(model_dim=DIM, num_encoder_layers=2,
                           num_decoder_layers=2, num_heads=HEADS,
                           ffn_inner_dim=DIM * 2, unit_vocab_size=120,
                           max_seq_len=256),
        arch="tiny_hf_v1")


def test_v1_speech_encoder_matches(hf_model, converted, my_cfg):
    from seamless_communication_tpu.models.unity import model as unity
    feats = torch.randn(1, 32, 160)
    with torch.no_grad():
        ref = hf_model.speech_encoder(input_features=feats).last_hidden_state
    fbank = jnp.asarray(feats.numpy()).reshape(1, 64, 80)
    enc = unity.encode_speech(converted, my_cfg, fbank, jnp.array([64]))
    assert_close(enc.seqs[:, :ref.shape[1]], ref.numpy(), atol=2e-3, rtol=1e-2)


def test_v1_text_decoder_logits_match(hf_model, converted, my_cfg):
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


def test_v1_ar_t2u_teacher_forced_logits_match(hf_model, converted, my_cfg):
    """AR T2U encode + teacher-forced decode vs the HF t2u model."""
    from seamless_communication_tpu.models.unity.t2u import ar_t2u_encode
    from seamless_communication_tpu.ops.masks import lengths_to_padding_mask
    from seamless_communication_tpu.ops.transformer import (
        embedding_frontend, tied_projection, transformer_decoder,
    )
    B, S, T = 1, 7, 5
    feats = torch.randn(B, S, DIM)
    dec_ids = torch.randint(4, 120, (B, T))
    t2u = hf_model.t2u_model
    with torch.no_grad():
        enc_ref = t2u.model.encoder(inputs_embeds=feats).last_hidden_state
        dec = t2u.model.decoder(input_ids=dec_ids, encoder_hidden_states=enc_ref)
        ref_logits = t2u.lm_head(dec.last_hidden_state)

    tcfg = my_cfg.ar_t2u
    enc, mask = ar_t2u_encode(converted["t2u"], tcfg, jnp.asarray(feats.numpy()),
                              jnp.full((B,), S, jnp.int32))
    assert_close(enc, enc_ref.numpy(), atol=2e-3, rtol=1e-2)
    x = embedding_frontend(converted["t2u"]["embed"], jnp.asarray(dec_ids.numpy()),
                           tcfg.dec_cfg(),
                           padding_mask=lengths_to_padding_mask(
                               jnp.full((B,), T, jnp.int32), T))
    h = transformer_decoder(converted["t2u"]["decoder"], x, tcfg.dec_cfg(),
                            enc_out=enc, enc_padding_mask=mask)
    logits = tied_projection(converted["t2u"]["embed"], h)
    assert_close(logits, ref_logits.numpy(), atol=5e-3, rtol=1e-2)


def test_v1_ar_t2u_greedy_decode_matches_hf_generate(hf_model, converted, my_cfg):
    """Compiled beam search (beam=1, greedy) against HF generate on the same
    converted model — the end-to-end unit-generation check the verdict asked
    for (reference models/unity/model.py:263-327 decode path)."""
    from seamless_communication_tpu.models.unity.t2u import (
        ar_t2u_cache, ar_t2u_decoder_step, ar_t2u_encode,
    )
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )
    from seamless_communication_tpu.ops.transformer import (
        decoder_cache_beam_reorder,
    )

    B, S = 1, 7
    MAX = 16
    feats = torch.randn(B, S, DIM)
    t2u = hf_model.t2u_model
    with torch.no_grad():
        ref_ids = t2u.generate(inputs_embeds=feats, num_beams=1, do_sample=False,
                               max_new_tokens=MAX - 3,
                               decoder_start_token_id=2,  # eos-as-bos convention
                               bos_token_id=0, eos_token_id=2, pad_token_id=1)

    tcfg = my_cfg.ar_t2u
    enc, mask = ar_t2u_encode(converted["t2u"], tcfg, jnp.asarray(feats.numpy()),
                              jnp.full((B,), S, jnp.int32))
    cache = ar_t2u_cache(converted["t2u"], tcfg, enc, MAX)

    def step_fn(tok_t, cache, step):
        return ar_t2u_decoder_step(converted["t2u"], tok_t, cache, step, tcfg,
                                   enc_padding_mask=mask)

    opts = BeamSearchOptions(beam_size=1, max_len=MAX, min_len=0,
                             pad_idx=tcfg.pad_idx, unk_idx=tcfg.unk_idx,
                             eos_idx=tcfg.eos_idx, bos_idx=tcfg.bos_idx)
    prefix = jnp.full((B, 1), tcfg.eos_idx, jnp.int32)
    res = beam_search(step_fn, cache, prefix, jnp.ones((B,), jnp.int32), opts,
                      tcfg.unit_vocab_size,
                      cache_reorder=decoder_cache_beam_reorder)
    got = np.asarray(res.tokens[0, 0])
    got_len = int(res.lengths[0, 0])
    ref = ref_ids[0].numpy()
    # align: HF output starts at the decoder_start token, ours at the prefix
    n = min(got_len, len(ref))
    mismatch = float(np.mean(got[:n] != ref[:n]))
    assert mismatch <= 0.1, (got[:n], ref[:n])


def test_v1_ar_t2u_beam5_matches_hf_generate(hf_model, converted, my_cfg):
    """Exact beam-5 AR T2U cross-check vs hf generate (length_penalty=0 where
    the normalization conventions coincide; a growing EOS boost applied
    identically on both sides terminates the random-init search naturally —
    same technique as the text beam check in test_hf_conversion.py). Drives
    the PRODUCTION decode path: src_to_step fused beam reorder."""
    from transformers import LogitsProcessor

    from seamless_communication_tpu.models.unity.t2u import (
        ar_t2u_cache, ar_t2u_decoder_step, ar_t2u_encode,
    )
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search,
    )

    BOOST, K, MAX = 0.3, 5, 32
    tcfg = my_cfg.ar_t2u

    class EosBoost(LogitsProcessor):
        def __call__(self, input_ids, scores):
            scores = scores.clone()
            scores[:, tcfg.eos_idx] += BOOST * (input_ids.shape[1] - 1)
            return scores

    g = torch.Generator().manual_seed(11)
    feats = torch.randn(2, 7, DIM, generator=g)
    t2u = hf_model.t2u_model
    with torch.no_grad():
        out = t2u.generate(inputs_embeds=feats, num_beams=K, do_sample=False,
                           length_penalty=0.0, early_stopping=False,
                           max_new_tokens=MAX - 4,
                           decoder_start_token_id=tcfg.eos_idx,
                           bos_token_id=tcfg.bos_idx,
                           eos_token_id=tcfg.eos_idx,
                           pad_token_id=tcfg.pad_idx,
                           logits_processor=[EosBoost()],
                           num_return_sequences=K,
                           return_dict_in_generate=True, output_scores=True)

    B = 2
    enc, mask = ar_t2u_encode(converted["t2u"], tcfg,
                              jnp.asarray(feats.numpy()),
                              jnp.full((B,), 7, jnp.int32))
    enc_bk = jnp.repeat(enc, K, axis=0)
    mask_bk = jnp.repeat(mask, K, axis=0)
    cache = ar_t2u_cache(converted["t2u"], tcfg, enc_bk, MAX)

    def step_fn(tok_t, cache, step, beam_src=None):
        return ar_t2u_decoder_step(converted["t2u"], tok_t, cache, step, tcfg,
                                   enc_padding_mask=mask_bk,
                                   beam_src=beam_src)

    def boost(tokens, step, lprobs):
        # prefix length 1: tokens generated so far at this decision == step
        return lprobs.at[:, :, tcfg.eos_idx].add(
            BOOST * step.astype(jnp.float32))

    opts = BeamSearchOptions(beam_size=K, max_len=MAX, min_len=0,
                             len_penalty=0.0, pad_idx=tcfg.pad_idx,
                             unk_idx=tcfg.unk_idx, eos_idx=tcfg.eos_idx,
                             bos_idx=tcfg.bos_idx)
    prefix = jnp.full((B, 1), tcfg.eos_idx, jnp.int32)
    res = jax.jit(lambda c: beam_search(
        step_fn, c, prefix, jnp.ones((B,), jnp.int32), opts,
        tcfg.unit_vocab_size, src_to_step=True, processors=[boost]))(cache)

    for b in range(B):
        for k in range(K):
            hf_seq = out.sequences[b * K + k].tolist()
            if tcfg.eos_idx in hf_seq[1:]:
                hf_seq = hf_seq[:hf_seq.index(tcfg.eos_idx, 1) + 1]
            L = int(res.lengths[b, k])
            my_seq = [int(t) for t in np.asarray(res.tokens[b, k])[:L]]
            assert my_seq == hf_seq, (b, k, my_seq, hf_seq)
            assert float(res.scores[b, k]) == pytest.approx(
                float(out.sequences_scores[b * K + k]), abs=2e-2), (b, k)
