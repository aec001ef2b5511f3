"""Streaming pipeline smoke tests on tiny models: S2T (EMMA policy) and full S2ST
(feature extractor -> encoder -> monotonic decoder -> NAR units -> vocoder),
plus latency-metric math checks."""

import numpy as np
import pytest

import jax

from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig, monotonic_decoder_init,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import get_arch
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.models.vocoder.codehifigan import (
    CodeHifiGanConfig, code_hifigan_init,
)
from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig
from seamless_communication_tpu.streaming.evaluator import (
    average_lagging, evaluate_streaming,
)
from seamless_communication_tpu.streaming.pipeline import (
    StreamingSession, build_s2st_pipeline, build_s2t_pipeline,
)
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import (
    SentencePieceModel, build_spm_model, TYPE_CONTROL, TYPE_NORMAL, TYPE_UNKNOWN,
)


@pytest.fixture(scope="module")
def setup():
    cfg = get_arch("tiny_v2")
    base = [("<unk>", 0.0, TYPE_UNKNOWN), ("<s>", 0.0, TYPE_CONTROL),
            ("</s>", 0.0, TYPE_CONTROL)]
    words = ["▁aa", "▁bb", "▁cc", ",", "."]
    chars = ["▁"] + list("abc.,")
    text_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(w, -2.0, TYPE_NORMAL) for w in words]
        + [(c, -10.0, TYPE_NORMAL) for c in chars]))
    char_spm = SentencePieceModel.from_bytes(build_spm_model(
        base + [(c, -1.0, TYPE_NORMAL) for c in chars]))
    text_tok = NllbTokenizer(text_spm, langs=["__eng__", "__fra__"])
    char_tok = CharTokenizer(char_spm)
    unit_tok = UnitTokenizer(100, ["eng", "fra"], "base_v2")

    unity_params = unity.unity_init(jax.random.PRNGKey(0), cfg)
    mono_cfg = MonotonicDecoderConfig(
        model_dim=64, num_layers=2, num_heads=4, ffn_inner_dim=128,
        vocab_size=256, num_monotonic_energy_layers=2, pre_decision_ratio=2)
    mono_params = monotonic_decoder_init(jax.random.PRNGKey(5), mono_cfg)
    voc_cfg = CodeHifiGanConfig(
        num_units=100, unit_embed_dim=32, num_langs=4, lang_embed_dim=8,
        num_spkrs=4, spkr_embed_dim=8, dur_predictor_hidden=16,
        hifigan=HifiGanConfig(model_in_dim=48, upsample_initial_channel=32,
                              upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 2),)))
    voc_params = code_hifigan_init(jax.random.PRNGKey(6), voc_cfg)
    return dict(cfg=cfg, unity_params=unity_params, mono_cfg=mono_cfg,
                mono_params=mono_params, text_tok=text_tok, char_tok=char_tok,
                unit_tok=unit_tok, voc_cfg=voc_cfg, voc_params=voc_params)


def test_average_lagging_math():
    # 3 tokens emitted at 300/600/900ms of a 900ms source, rate = 300ms/token
    al = average_lagging([300, 600, 900], 900.0, 3)
    assert al == pytest.approx(300.0)
    # LAAL with over-generation normalizes by hyp length
    laal = average_lagging([300, 600, 900], 900.0, 2, length_adaptive=True)
    assert laal == pytest.approx(300.0)


def test_s2t_streaming(setup):
    s = setup
    pipe = build_s2t_pipeline(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"], s["text_tok"],
        tgt_lang="eng", min_starting_wait_w2vbert=16, decision_threshold=0.4,
        max_len_b=12, max_consecutive_writes=6)
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)).astype(np.float32)
    session = StreamingSession(pipe, segment_size_ms=320, tgt_lang="eng")
    outs = list(session.run(wav))
    # pipeline must terminate with a finished segment
    assert outs and outs[-1][1].finished


def test_s2st_streaming(setup):
    s = setup
    pipe = build_s2st_pipeline(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"], s["text_tok"],
        s["unit_tok"], s["char_tok"], s["voc_params"], s["voc_cfg"],
        {"multilingual": {"eng": 0}, "multispkr": {"eng": [0]}},
        tgt_lang="eng", min_starting_wait_w2vbert=16, decision_threshold=0.4,
        min_unit_chunk_size=5, max_len_b=12, max_consecutive_writes=6,
        text_bucket=32)
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)).astype(np.float32)
    session = StreamingSession(pipe, segment_size_ms=320, tgt_lang="eng")
    total_wav = 0
    finished = False
    for _, seg in session.run(wav):
        if hasattr(seg, "sample_rate") and seg.content is not None:
            total_wav += np.asarray(seg.content).size
        finished = finished or seg.finished
    assert finished


def test_streaming_evaluator(setup):
    s = setup
    wavs = [(0.1 * np.sin(2 * np.pi * 250 * np.arange(16000) / 16000)).astype(np.float32)]

    def factory():
        return build_s2t_pipeline(
            s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
            s["text_tok"], tgt_lang="eng", min_starting_wait_w2vbert=16,
            decision_threshold=0.4, max_len_b=12, max_consecutive_writes=6)

    metrics = evaluate_streaming(factory, wavs, references=["aa bb"],
                                 tgt_lang="eng")
    assert "bleu" in metrics and "AL_ms" in metrics and "LAAL_ms" in metrics
    assert metrics["num_instances"] == 1


def test_fused_matches_unfused_s2t(setup):
    """The one-program-per-chunk fused agent (streaming/fused.py) must emit the
    exact same token sequence as the separate encoder + decoder agents."""
    s = setup
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)).astype(np.float32)
    kw = dict(tgt_lang="eng", min_starting_wait_w2vbert=16,
              decision_threshold=0.001, max_len_b=12, max_consecutive_writes=6)
    toks = {}
    for fused in (False, True):
        pipe = build_s2t_pipeline(
            s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
            s["text_tok"], fused=fused, **kw)
        list(StreamingSession(pipe, segment_size_ms=320, tgt_lang="eng").run(wav))
        dec = pipe.agents[1 if fused else 2]
        toks[fused] = list(dec.states.target_indices)
    assert toks[True] == toks[False] and len(toks[True]) > 0


def test_incremental_matches_fused_s2t(setup):
    """The incremental-encoder fused agent must emit the exact token sequence
    of the full-re-encode fused agent on a chunk-causal (streaming-style) card."""
    import dataclasses

    from seamless_communication_tpu.models.wav2vec2.encoder import (
        SpeechEncoderConfig,
    )
    from seamless_communication_tpu.ops.conformer import ConformerConfig

    s = setup
    cfg = dataclasses.replace(
        s["cfg"],
        speech=SpeechEncoderConfig(
            model_dim=64, feature_dim=160, ffn_inner_dim=128,
            num_adaptor_heads=4,
            conformer=ConformerConfig(dim=64, ffn_inner_dim=128, num_heads=4,
                                      num_layers=2, depthwise_kernel_size=7,
                                      pos_type="shaw", shaw_max_left=8,
                                      shaw_max_right=3,
                                      causal_depthwise_conv=True),
            chunk_size=4, left_chunk_num=-1))
    params = unity.unity_init(jax.random.PRNGKey(3), cfg)
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)
           ).astype(np.float32)
    kw = dict(tgt_lang="eng", min_starting_wait_w2vbert=16,
              decision_threshold=0.001, max_len_b=12, max_consecutive_writes=6)
    toks = {}
    for mode in (True, "incremental"):
        pipe = build_s2t_pipeline(params, cfg, s["mono_params"], s["mono_cfg"],
                                  s["text_tok"], fused=mode, **kw)
        list(StreamingSession(pipe, segment_size_ms=320,
                              tgt_lang="eng").run(wav))
        toks[mode] = list(pipe.agents[1].states.target_indices)
    assert toks["incremental"] == toks[True] and len(toks[True]) > 0


def test_s2st_tree_streaming(setup):
    """The joint S2TT+S2ST tree pipeline (reference UnitYAgentTreePipeline,
    unity_pipeline.py:197-243) must emit BOTH text and waveform segments from
    one session, and both branches must finish."""
    from seamless_communication_tpu.streaming.pipeline import (
        build_s2st_tree_pipeline,
    )

    s = setup
    pipe = build_s2st_tree_pipeline(
        s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"], s["text_tok"],
        s["unit_tok"], s["char_tok"], s["voc_params"], s["voc_cfg"],
        {"multilingual": {"eng": 0}, "multispkr": {"eng": [0]}},
        tgt_lang="eng", min_starting_wait_w2vbert=16, decision_threshold=0.4,
        min_unit_chunk_size=5, max_len_b=12, max_consecutive_writes=6,
        text_bucket=32)
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)).astype(np.float32)
    session = StreamingSession(pipe, segment_size_ms=320, tgt_lang="eng")
    text_out, wav_samples = [], 0
    for _, seg in session.run(wav):
        if hasattr(seg, "sample_rate"):
            if seg.content is not None:
                wav_samples += np.asarray(seg.content).size
        elif seg.content:
            text_out.append(str(seg.content))
    assert pipe.finished
    assert wav_samples > 0, "speech branch emitted no audio"
    assert any(t.strip() for t in text_out), "text branch emitted no words"


def test_tree_matches_linear_s2st(setup):
    """The tree pipeline's unit branch must produce the exact same decoder
    token sequence and unit stream as the linear S2ST pipeline (the fan-out
    must not perturb the decoder/unit agents), and fused == unfused holds for
    the tree as it does for the linear pipelines."""
    from seamless_communication_tpu.streaming.pipeline import (
        build_s2st_tree_pipeline,
    )

    s = setup
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)).astype(np.float32)
    kw = dict(tgt_lang="eng", min_starting_wait_w2vbert=16,
              decision_threshold=0.001, min_unit_chunk_size=5, max_len_b=12,
              max_consecutive_writes=6, text_bucket=32)
    args = (s["unity_params"], s["cfg"], s["mono_params"], s["mono_cfg"],
            s["text_tok"], s["unit_tok"], s["char_tok"], s["voc_params"],
            s["voc_cfg"], {"multilingual": {"eng": 0}, "multispkr": {"eng": [0]}})

    results = {}
    for fused in (False, True):
        units = {}
        for kind in ("linear", "tree"):
            build = build_s2st_pipeline if kind == "linear" else build_s2st_tree_pipeline
            pipe = build(*args, fused=fused, **kw)
            agents = pipe.agents
            dec = agents[1 if fused else 2]
            unit_dec = next(a for a in agents
                            if type(a).__name__ == "NARUnitYUnitDecoderAgent")
            emitted = []
            for _, seg in StreamingSession(pipe, segment_size_ms=320,
                                           tgt_lang="eng").run(wav):
                if not hasattr(seg, "sample_rate") and not isinstance(
                        seg.content, (str, type(None))):
                    emitted.append(seg)
            units[kind] = (list(dec.states.target_indices),
                           list(unit_dec.states.source_token_list))
        assert units["tree"] == units["linear"]
        assert len(units["tree"][0]) > 0
        results[fused] = units["tree"]
    assert results[True] == results[False]


def test_s2t_streaming_int8_mono(setup):
    """mono_quantize_int8=True (the TPU serving default) must stream end to
    end on CPU too: every linear/embedding in the EMMA decode path dispatches
    to the int8 variants (ops/quantization.py). Runs BOTH the plain-fused and
    the incremental agent — the latter once derived its encoder-state dtype
    from the mono tree's first leaf, which int8 quantization turns into an
    int8 KV state (caught on TPU; fused.py now picks the first floating
    unity leaf)."""
    import dataclasses

    from seamless_communication_tpu.models.wav2vec2.encoder import (
        SpeechEncoderConfig,
    )
    from seamless_communication_tpu.ops.conformer import ConformerConfig

    s = setup
    wav = (0.1 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)
           ).astype(np.float32)
    kw = dict(tgt_lang="eng", min_starting_wait_w2vbert=16,
              decision_threshold=0.4, max_len_b=12, max_consecutive_writes=6,
              mono_quantize_int8=True)

    pipe = build_s2t_pipeline(s["unity_params"], s["cfg"], s["mono_params"],
                              s["mono_cfg"], s["text_tok"], **kw)
    outs = list(StreamingSession(pipe, segment_size_ms=320,
                                 tgt_lang="eng").run(wav))
    assert outs and outs[-1][1].finished

    chunk_cfg = dataclasses.replace(
        s["cfg"],
        speech=SpeechEncoderConfig(
            model_dim=64, feature_dim=160, ffn_inner_dim=128,
            num_adaptor_heads=4,
            conformer=ConformerConfig(dim=64, ffn_inner_dim=128, num_heads=4,
                                      num_layers=2, depthwise_kernel_size=7,
                                      pos_type="shaw", shaw_max_left=8,
                                      shaw_max_right=3,
                                      causal_depthwise_conv=True),
            chunk_size=4, left_chunk_num=-1))
    params = unity.unity_init(jax.random.PRNGKey(3), chunk_cfg)
    pipe = build_s2t_pipeline(params, chunk_cfg, s["mono_params"],
                              s["mono_cfg"], s["text_tok"],
                              fused="incremental", **kw)
    outs = list(StreamingSession(pipe, segment_size_ms=320,
                                 tgt_lang="eng").run(wav))
    assert outs and outs[-1][1].finished
