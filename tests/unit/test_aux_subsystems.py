"""Tests for aux subsystems: aligner Viterbi, ECAPA, PRETSSEL, VAD, eval metrics,
toxicity, unit extractor kmeans, serialization."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_monotonic_alignment_search_simple():
    from seamless_communication_tpu.models.aligner.model import (
        monotonic_alignment_search, viterbi_durations,
    )
    # 6 feature frames, 3 text tokens; block-diagonal preference
    lp = np.full((6, 3), -10.0)
    for j, i in enumerate([0, 0, 1, 1, 2, 2]):
        lp[j, i] = -0.1
    path = monotonic_alignment_search(lp)
    assert list(path) == [0, 0, 1, 1, 2, 2]
    dur = viterbi_durations(lp[None], np.array([3]), np.array([6]))
    assert list(dur[0]) == [2, 2, 2]


def test_aligner_forward_shapes():
    from seamless_communication_tpu.models.aligner import (
        AlignerConfig, aligner_init, aligner_forward,
    )
    cfg = AlignerConfig(embed_dim=16, feat_dim=24, text_vocab_size=40,
                        unit_vocab_size=50, text_layers=2, feat_layers=2)
    params = aligner_init(jax.random.PRNGKey(0), cfg)
    text = jnp.asarray(np.random.randint(4, 40, (2, 7)))
    units = jnp.asarray(np.random.randint(4, 50, (2, 19)))
    lprob, dur = aligner_forward(params, cfg, text, units, np.array([7, 5]),
                                 np.array([19, 12]))
    assert lprob.shape == (2, 19, 7)
    assert dur.shape == (2, 7)
    assert dur[0].sum() == 19 and dur[1].sum() == 12
    assert dur[1, 5:].sum() == 0  # no duration on padded text


def test_ecapa_shapes_and_norm():
    from seamless_communication_tpu.models.pretssel.ecapa_tdnn import (
        EcapaConfig, ecapa_forward, ecapa_init,
    )
    cfg = EcapaConfig(channels=(32, 32, 32, 32, 96), kernel_sizes=(5, 3, 3, 3, 1),
                      dilations=(1, 2, 3, 4, 1), attention_channels=16,
                      res2net_scale=4, se_channels=16, groups=(1,) * 5,
                      embed_dim=24, input_dim=80)
    params = ecapa_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 37, 80))
    mask = jnp.asarray(np.arange(37)[None] < np.array([[37], [20]]))
    emb = ecapa_forward(params, x, cfg, padding_mask=mask)
    assert emb.shape == (2, 24)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(emb), axis=-1), 1.0,
                               atol=1e-5)


def test_pretssel_vocoder_shapes():
    from seamless_communication_tpu.models.pretssel.vocoder import (
        PretsselConfig, pretssel_forward, pretssel_init,
    )
    from seamless_communication_tpu.models.pretssel.ecapa_tdnn import EcapaConfig
    from seamless_communication_tpu.models.pretssel.streamable import SeanetConfig
    from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig

    cfg = PretsselConfig(
        num_units=50, model_dim=32, num_heads=2, ffn_inner_dim=64,
        conv_kernel_size=5, num_encoder_layers=1, num_decoder_layers=1,
        num_langs=4, lang_embed_dim=8, prosody_dim=16, mel_dim=80,
        pn_conv_dim=32, pn_layers=2, pn_kernel_size=5, var_pred_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=80, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)),
        seanet=SeanetConfig(dimension=16, n_filters=4, ratios=(4, 2), lstm=1),
        ecapa=EcapaConfig(channels=(16, 16, 16, 16, 32), kernel_sizes=(5, 3, 3, 3, 1),
                          dilations=(1, 2, 3, 4, 1), attention_channels=8,
                          res2net_scale=4, se_channels=8, groups=(1,) * 5,
                          embed_dim=16, input_dim=80))
    params = pretssel_init(jax.random.PRNGKey(0), cfg)
    units = jnp.asarray(np.random.randint(4, 50, (1, 8)))
    durs = jnp.full((1, 8), 2, jnp.int32)
    fb = jax.random.normal(jax.random.PRNGKey(1), (1, 30, 80))
    out = pretssel_forward(params, cfg, units, jnp.array([8]), durs, fb,
                           jnp.array([30]), jnp.array([1]), max_mel_len=32)
    assert out.mel.shape == (1, 32, 80)
    assert int(out.sample_lengths[0]) == 16 * 8  # sum(dur)=16, upsample 8x
    assert np.all(np.isfinite(np.asarray(out.waveform)))


def test_vad_segmenter():
    from seamless_communication_tpu.segment.vad import VADSegmenter
    rng = np.random.default_rng(0)
    sr = 16000
    speech = 0.5 * np.sin(2 * np.pi * 200 * np.arange(3 * sr) / sr)
    silence = 0.001 * rng.standard_normal(sr)
    wav = np.concatenate([speech, silence, speech]).astype(np.float32)
    seg = VADSegmenter(chunk_size_sec=4.0, pause_length=0.2)
    chunks = seg.segment_long_input(wav)
    assert len(chunks) >= 2
    assert all((e - s) <= 4.0 * sr for s, e in chunks)


def test_eval_metrics():
    from seamless_communication_tpu.cli.eval_utils import (
        compute_asr_error_rate, compute_corpus_metric_score,
    )
    assert compute_corpus_metric_score(
        ["the cat sat on the mat"],
        ["the cat sat on the mat"]) == pytest.approx(100.0)
    assert compute_asr_error_rate(["a b c"], ["a b c"]) == 0.0
    assert compute_asr_error_rate(["a x c"], ["a b c"]) == pytest.approx(1 / 3)


def test_etox_added_toxicity():
    from seamless_communication_tpu.toxicity.etox import ETOXBadWordChecker
    checker = ETOXBadWordChecker.from_word_lists(
        {"eng": ["badword"], "fra": ["mechant"]})
    # added: target has it, source doesn't
    assert checker.extract_bad_words("hello", "you badword", "eng", "eng")
    # not added: both have it
    assert not checker.extract_bad_words("badword src", "you badword", "eng", "eng")
    assert not checker.extract_bad_words("hello", "clean text", "eng", "eng")


def test_mintox_banned_sequences_and_rerun():
    from seamless_communication_tpu.text.spm import (
        SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
    )
    from seamless_communication_tpu.text.nllb import NllbTokenizer
    from seamless_communication_tpu.toxicity.etox import ETOXBadWordChecker
    from seamless_communication_tpu.toxicity.mintox import mintox_pipeline

    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    pieces = base + [(w, -5.0, TYPE_NORMAL) for w in
                     ["▁bad", "▁good", "▁text", "★", "▁"]]
    tok = NllbTokenizer(SentencePieceModel.from_bytes(build_spm_model(pieces)),
                        langs=["__eng__"])
    checker = ETOXBadWordChecker.from_word_lists({"eng": ["bad"]})
    calls = {}

    def rerun(indices, banned):
        calls["indices"] = indices
        calls["banned"] = banned
        return ["good text"], None

    texts, units = mintox_pipeline(
        checker=checker, text_tokenizer=tok,
        src_texts=["good text", "good text"],
        original_texts=["good text", "bad text"],
        original_units=None, src_lang="eng", tgt_lang="eng", rerun_fn=rerun)
    assert calls["indices"] == [1]
    assert texts == ["good text", "good text"]
    assert calls["banned"][0].shape[0] >= 1


def test_kmeans_quantizer():
    from seamless_communication_tpu.models.unit_extractor.unit_extractor import (
        KmeansModel,
    )
    centroids = np.array([[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
    km = KmeansModel(centroids)
    x = jnp.asarray([[0.1, -0.1], [9.5, 10.2], [1.0, 9.0]])
    assert list(np.asarray(km(x))) == [0, 1, 2]


def test_params_npz_roundtrip(tmp_path):
    from seamless_communication_tpu.checkpoint.serialize import (
        load_params, save_params,
    )
    params = {"a": {"weight": np.ones((3, 2))},
              "layers": [{"w": np.zeros(4)}, {"w": np.ones(4)}]}
    p = str(tmp_path / "ckpt.npz")
    save_params(p, params)
    back = load_params(p)
    assert back["a"]["weight"].shape == (3, 2)
    assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    np.testing.assert_array_equal(back["layers"][1]["w"], np.ones(4))


def test_vad_probs_fn_speech_vs_noise():
    """pdac must split on speech PROBABILITY, not raw energy: with a synthetic
    probs_fn that marks loud noise as non-speech, the noisy span is excluded
    even though it dominates the energy (reference silero_vad behavior)."""
    from seamless_communication_tpu.segment.vad import VADSegmenter

    sr, win = 16000, 512
    rng = np.random.default_rng(0)
    # 6s: [1s silence | 2s speech | 1s LOUD noise | 2s speech]
    wav = np.concatenate([
        np.zeros(sr, np.float32),
        0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr).astype(np.float32),
        3.0 * rng.standard_normal(sr).astype(np.float32),
        0.2 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr).astype(np.float32),
    ])
    speech_windows = (np.arange(len(wav) // win) * win // sr)

    def probs_fn(w):
        n = len(w) // win
        t = np.arange(n) * win / sr
        return np.where((t >= 1.0) & (t < 3.0) | (t >= 4.0), 0.9, 0.05
                        ).astype(np.float32)

    seg = VADSegmenter(sample_rate=sr, chunk_size_sec=2.5, probs_fn=probs_fn)
    chunks = seg.segment_long_input(wav)
    assert len(chunks) >= 2
    for start, end in chunks:
        # no chunk may live inside the loud-noise span (3s-4s)
        assert not (start >= 3 * sr and end <= 4 * sr)
    # the speech onsets are covered
    assert any(s <= 1.1 * sr and e >= 1.5 * sr for s, e in chunks)
    assert any(s <= 4.2 * sr and e >= 4.8 * sr for s, e in chunks)


def test_whisper_normalizer_fallback():
    from seamless_communication_tpu.cli.eval_utils import whisper_normalize_text

    assert whisper_normalize_text("Hello, World!  [noise]", "eng") == "hello world"
    # diacritics stripped, symbols dropped (basic normalizer path)
    got = whisper_normalize_text("Héllo — wörld!", "deu")
    assert got == "hello world"


def test_asr_bleu_with_stub_transcriber():
    from seamless_communication_tpu.cli.eval_utils import compute_asr_bleu

    refs = ["the cat sat on the mat", "hello world"]
    score = compute_asr_bleu([None, None], refs,
                             transcribe=lambda wavs: ["The cat sat on the mat!",
                                                      "Hello, world"],
                             lang="eng")
    assert score > 99.0   # normalization makes them exact matches


def test_mutox_pt_roundtrip_and_speech_pipeline(tmp_path):
    """Converter round-trip for the reference mutox .pt layout
    (model_all.N.1 Sequential keys, toxicity/mutox/builder.py:44-64) + the
    speech pipeline end-to-end with a stub SONAR embedder."""
    import torch

    from seamless_communication_tpu.checkpoint.convert_fairseq2 import (
        load_pt_state_dict, mutox_tree_from_pt,
    )
    from seamless_communication_tpu.toxicity.mutox import (
        MutoxClassifier, MutoxConfig, mutox_forward, mutox_init,
    )
    from seamless_communication_tpu.toxicity.mutox_speech import (
        MutoxSpeechPipeline,
    )

    cfg = MutoxConfig(input_size=16, hidden_sizes=(8, 4))
    params = mutox_init(jax.random.PRNGKey(0), cfg)
    sd = {}
    for i, layer in enumerate(params["layers"]):
        w = np.asarray(layer["linear"]["weight"]).T
        sd[f"model_all.{i}.1.weight"] = torch.from_numpy(w.copy())
        sd[f"model_all.{i}.1.bias"] = torch.from_numpy(
            np.asarray(layer["linear"]["bias"]).copy())
    path = tmp_path / "mutox.pt"
    torch.save({"model": sd}, path)
    got = mutox_tree_from_pt(load_pt_state_dict(str(path)))
    emb = np.random.default_rng(0).standard_normal((3, 16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(mutox_forward(got, jnp.asarray(emb), cfg)),
                               np.asarray(mutox_forward(params, jnp.asarray(emb), cfg)))

    # e2e pipeline with a stub embedder: loud wavs map to a toxic embedding
    def stub_embedder(wavs):
        return np.stack([np.full(16, np.sign(np.mean(np.abs(w))) *
                                 (10.0 if np.abs(w).max() > 0.5 else -10.0),
                                 np.float32) for w in wavs])

    pipe = MutoxSpeechPipeline(MutoxClassifier(got, cfg), stub_embedder)
    quiet = 0.01 * np.ones(1600, np.float32)
    loud = 0.9 * np.ones(1600, np.float32)
    logits = pipe.predict([quiet, loud, quiet], batch_size=2)
    assert logits.shape == (3,)
    # same input -> same logit (up to batch-composition rounding)
    np.testing.assert_allclose(logits[0], logits[2], rtol=1e-5)
    assert abs(logits[0] - logits[1]) > 1e-3   # embedder distinguishes inputs


def test_aggregate_xplane_parses_wire_format(tmp_path):
    """The dependency-free xplane reader must aggregate per-op durations from
    a hand-encoded XSpace proto (utils/profiling.py wire-format subset)."""
    from seamless_communication_tpu.utils.profiling import aggregate_xplane

    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    def field(num, wire, payload):
        tag = varint((num << 3) | wire)
        if wire == 2:
            return tag + varint(len(payload)) + payload
        return tag + varint(payload)

    def msg(*fields):
        return b"".join(fields)

    meta1 = field(4, 2, msg(field(1, 0, 7),
                            field(2, 2, msg(field(1, 0, 7),
                                            field(2, 2, b"%fusion.1")))))
    meta2 = field(4, 2, msg(field(1, 0, 9),
                            field(2, 2, msg(field(1, 0, 9),
                                            field(2, 2, b"%copy.2")))))
    ev = lambda mid, ps: field(4, 2, msg(field(1, 0, mid), field(3, 0, ps)))
    line = field(3, 2, msg(field(2, 2, b"XLA Ops"),
                           ev(7, 1_000_000_000), ev(7, 500_000_000),
                           ev(9, 250_000_000)))
    other_line = field(3, 2, msg(field(2, 2, b"Steps"), ev(7, 9_999_999_999)))
    plane = field(1, 2, msg(field(2, 2, b"/device:TPU:0"),
                            meta1, meta2, line, other_line))
    cpu_plane = field(1, 2, msg(field(2, 2, b"/host:CPU"), meta1, line))
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(msg(plane, cpu_plane))

    out = aggregate_xplane(str(path))
    assert out == [(1.5, 2, "%fusion.1"), (0.25, 1, "%copy.2")]


def test_load_etox_checker_from_dir(tmp_path):
    """Offline etox word-list loader (nllb-200_twl layout)."""
    from seamless_communication_tpu.toxicity.etox import load_etox_checker

    (tmp_path / "eng_twl.txt").write_text("badword\nawful phrase\n")
    (tmp_path / "fra_twl.txt").write_text("mauvais\n")
    checker = load_etox_checker(str(tmp_path))
    assert checker.get_bad_words("a badword here", "eng") == ["badword"]
    assert checker.get_bad_words("clean text", "eng") == []
    assert "mauvais" in checker.bad_words["fra"]


def test_strip_silence():
    """Dataloader silence removal (reference streaming/dataloaders/s2tt.py:48-81):
    leading/trailing silence is trimmed to [first speech, last speech); pure
    silence (no window over threshold) returns the waveform unchanged."""
    from seamless_communication_tpu.segment.vad import strip_silence

    sr = 16000
    rng = np.random.default_rng(0)
    silence = rng.normal(0, 1e-4, sr).astype(np.float32)          # 1 s hiss
    speech = (0.3 * np.sin(2 * np.pi * 220 * np.arange(2 * sr) / sr)
              * (1 + 0.5 * np.sin(2 * np.pi * 3 * np.arange(2 * sr) / sr))
              ).astype(np.float32)                                 # 2 s tone
    wav = np.concatenate([silence, speech, silence])

    out = strip_silence(wav)
    # trimmed to roughly the speech span (window-size granularity)
    assert len(out) < len(wav) - sr        # dropped most of the 2 s of silence
    assert len(out) >= len(speech) - 2048  # kept the speech
    # the retained audio is the loud part
    assert np.abs(out).mean() > 1.5 * np.abs(wav).mean()

    # no speech at all -> unchanged (reference: empty timestamps -> full list)
    flat = rng.normal(0, 1e-5, sr).astype(np.float32)
    np.testing.assert_array_equal(strip_silence(flat), flat)
