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


# ---------------------------------------------------------------------------
# End-to-end executable-oracle parity: full beam-5 decode and the
# text->char->duration->unit chain vs hf generate. Conventions proven equal
# at length_penalty=0.0 (identical score = plain lprob sum on both sides);
# at the default length_penalty=1.0 the normalizations differ by construction
# (fairseq2 divides by (full_len+1)^p — fairseq2.cpp:1381 _finalize_hypothesis;
# HF divides by generated_len^p — _update_finished_beams) so rankings can
# differ there: a documented convention difference, not a bug. The fairseq
# top-K EOS-finalize rule and the stop-when-no-improvement rule are identical
# on both sides and are what these tests pin.
# ---------------------------------------------------------------------------

LANG = 256  # stand-in tgt-lang control token (any id the tiny model can emit)


def _eos_boost_pair(boost: float):
    """A deterministic, growing EOS boost applied IDENTICALLY on both sides
    (HF processors run on log-softmax scores in beam search — generation/
    utils.py _beam_search — exactly where our `processors` run), so the
    random-init searches terminate naturally instead of hitting caps."""
    from transformers import LogitsProcessor

    class EosBoost(LogitsProcessor):
        def __call__(self, input_ids, scores):
            scores = scores.clone()
            scores[:, 3] += boost * (input_ids.shape[1] - 2)
            return scores

    def ours(tokens, step, lprobs):
        # gen_pos = step + 1; tokens generated so far = step + 1 - prefix(2)
        return lprobs.at[:, :, 3].add(boost * (step - 1).astype(jnp.float32))

    return EosBoost(), ours


def _hf_trim(seq):
    """HF pads finished hypotheses with `pad_token_id or eos` — with pad=0
    that resolves to EOS — so truncate at the first post-prefix EOS."""
    seq = list(seq)
    if 3 in seq[2:]:
        return seq[:seq.index(3, 2) + 1]
    return seq


@pytest.mark.parametrize("boost,ngram", [(0.15, None), (0.15, 2), (0.06, None)])
def test_beam5_matches_hf_generate(hf_model, converted, my_cfg, boost, ngram):
    """Full beam-5 S2TT decode: every one of the 5 hypotheses, both batch
    rows, must match hf generate token-for-token with matching scores —
    including hypothesis ORDER (ties, EOS finalization, early stop) and the
    n-gram repeat blocker. Proxies the reference golden sentences
    (tests/integration/inference/test_translator.py:19-93) until weights day."""
    from seamless_communication_tpu.models.unity import model as unity
    from seamless_communication_tpu.ops.beam_search import (
        BeamSearchOptions, beam_search, make_ngram_repeat_block,
    )

    K, T, V = 5, 64, 300
    hf_proc, my_proc = _eos_boost_pair(boost)
    g = torch.Generator().manual_seed(42)
    feats = torch.randn(2, 32, 160, generator=g)
    with torch.no_grad():
        out = hf_model.generate(
            input_features=feats, generate_speech=False,
            decoder_input_ids=torch.tensor([[3, LANG]] * 2),
            num_beams=K, length_penalty=0.0, early_stopping=False,
            max_new_tokens=60, return_dict_in_generate=True,
            output_scores=True, num_return_sequences=K,
            no_repeat_ngram_size=ngram, logits_processor=[hf_proc])

    fbank = jnp.asarray(feats.numpy()).reshape(2, 64, 80)
    enc = unity.encode_speech(converted, my_cfg, fbank, jnp.array([64, 64]))
    enc_bk = unity.EncoderOutput(jnp.repeat(enc.seqs, K, axis=0),
                                 jnp.repeat(enc.lengths, K, axis=0))
    step_fn, cache_fn = unity.make_text_decode_step(converted, my_cfg, enc_bk)
    procs = ([make_ngram_repeat_block(ngram, V)] if ngram else []) + [my_proc]
    opts = BeamSearchOptions(beam_size=K, max_len=T, min_len=0,
                             len_penalty=0.0, pad_idx=0, unk_idx=1,
                             bos_idx=2, eos_idx=3)
    res = jax.jit(lambda c, p, pl: beam_search(
        step_fn, c, p, pl, opts, V, src_to_step=True, processors=procs))(
            cache_fn(T, False), jnp.asarray([[3, LANG]] * 2, jnp.int32),
            jnp.asarray([2, 2], jnp.int32))

    for b in range(2):
        for k in range(K):
            hf_seq = _hf_trim(out.sequences[b * K + k].tolist())
            L = int(res.lengths[b, k])
            my_seq = [int(t) for t in np.asarray(res.tokens[b, k])[:L]]
            assert my_seq == hf_seq, (b, k, my_seq, hf_seq)
            assert float(res.scores[b, k]) == pytest.approx(
                float(out.sequences_scores[b * K + k]), abs=2e-2), (b, k)


@pytest.fixture(scope="module")
def tiny_tokenizers():
    """Text/char/unit tokenizers whose id maps EXACTLY mirror what the test
    exports into hf generation_config (id_to_text / char_to_id), so both
    chains see identical subword strings and char ids for every token id."""
    from seamless_communication_tpu.models.unity.unit_tokenizer import (
        UnitTokenizer,
    )
    from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
    from seamless_communication_tpu.text.nllb import NllbTokenizer
    from seamless_communication_tpu.text.spm import (
        SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL,
        TYPE_UNKNOWN,
    )

    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc", ",", ".", "ab", "▁a"]
    words += [f"▁w{i}" for i in range(252 - len(words))]
    text_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words]))
    # 3 base + 252 pieces = 255 -> langs at 256/257: LANG == lang_token("eng")
    text_tok = NllbTokenizer(text_spm, langs=["__eng__", "__fra__"])
    assert text_tok.lang_token("eng") == LANG

    chars = ["▁", ",", "."] + [chr(ord("a") + i) for i in range(26)] \
        + [str(d) for d in range(10)]
    char_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in chars]))
    char_tok = CharTokenizer(char_spm)
    # 113 units + 2 langs + 1 + 4 control = t2u vocab 120
    unit_tok = UnitTokenizer(113, ["eng", "fra"], "base_v2")
    assert unit_tok.vocab_size == 120
    return text_tok, char_tok, unit_tok


def test_t2u_chain_matches_hf(hf_model, converted, my_cfg, tiny_tokenizers):
    """text -> redecode -> char ids/counts -> duration -> NAR unit argmax:
    our UnitYGenerator.generate_units must produce the exact unit stream of
    hf's speech-generation chain (modeling_seamless_m4t_v2.py generate lines
    ~167-232: text_decoder redecode over sequences[:, :-1], char helpers,
    t2u_model, argmax) for the same generated text. B=1: for multi-row
    batches HF attends over its EOS fill (sequences padded with
    `pad_token_id or eos`) where fairseq2 masks real pads — we follow the
    reference convention, so rows are compared one at a time."""
    from seamless_communication_tpu.inference.generator import UnitYGenerator
    from seamless_communication_tpu.models.unity import model as unity

    text_tok, char_tok, unit_tok = tiny_tokenizers
    gc = hf_model.generation_config
    gc.id_to_text = {str(i): text_tok.id_to_token(i) for i in range(300)}
    gc.char_to_id = {c: char_tok.encode_chars(c)[0]
                     for c in ["▁", ",", "."]
                     + [chr(ord("a") + i) for i in range(26)]
                     + [str(d) for d in range(10)]}

    hf_proc, _ = _eos_boost_pair(0.06)
    g = torch.Generator().manual_seed(7)
    feats = torch.randn(1, 32, 160, generator=g)
    with torch.no_grad():
        out = hf_model.generate(
            input_features=feats, generate_speech=False,
            decoder_input_ids=torch.tensor([[3, LANG]]),
            num_beams=5, length_penalty=0.0, early_stopping=False,
            max_new_tokens=60, return_dict_in_generate=True,
            logits_processor=[hf_proc])
        seqs = torch.tensor([_hf_trim(out.sequences[0].tolist())])
        assert seqs.shape[1] > 4 and seqs[0, -1] == 3

        # --- hf t2u chain (generate's speech path, reimplemented verbatim
        # because generate_speech=True needs lang-code dicts + runs vocoder) --
        enc_h = hf_model.speech_encoder(input_features=feats).last_hidden_state
        t2u_embeds = hf_model.text_decoder(
            input_ids=seqs[:, :-1],
            encoder_hidden_states=enc_h).last_hidden_state
        pad_id = 0
        t2u_ids = seqs[:, 2:-1]
        t2u_ids = torch.masked_fill(t2u_ids, t2u_ids == 3, pad_id)
        subwords = hf_model._indices_to_subwords(t2u_ids)
        counts = hf_model._count_character_length_in_subword(
            t2u_ids, subwords, pad_token_id=pad_id)
        zero = counts.new_zeros((counts.shape[0], 1))
        counts = torch.cat([zero, counts, zero], dim=1)
        char_ids = hf_model._get_char_input_ids(
            t2u_ids, subwords, counts, pad_token_id=pad_id)
        from transformers.models.seamless_m4t_v2.modeling_seamless_m4t_v2 import (
            _compute_new_attention_mask,
        )
        seq_lens = (seqs[:, :-1] != pad_id).int().sum(1)
        attn = _compute_new_attention_mask(t2u_embeds, seq_lens)
        t2u_out = hf_model.t2u_model(inputs_embeds=t2u_embeds,
                                     char_input_ids=char_ids,
                                     char_count_per_id=counts,
                                     attention_mask=attn)
        hf_units = t2u_out[0].argmax(dim=-1)
        hf_mask = t2u_out[1].bool()

    # --- our chain: the real driver -------------------------------------
    gen = UnitYGenerator(converted, my_cfg, text_tok, unit_tok, char_tok)
    fbank = jnp.asarray(feats.numpy()).reshape(1, 64, 80)
    enc = unity.encode_speech(converted, my_cfg, fbank, jnp.array([64]))
    text_tokens = np.asarray(seqs.numpy(), np.int64)
    text_lens = np.asarray([seqs.shape[1]], np.int64)
    ours = gen.generate_units(text_tokens, text_lens, enc, "eng")[0]

    L = int(hf_mask[0].sum())
    hf_raw = unit_tok.decode(hf_units.numpy())[0, :L]
    want = [int(t) for t in hf_raw if 0 <= t < unit_tok.num_units]
    assert len(ours) > 0
    assert ours == want, (ours, want)


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
