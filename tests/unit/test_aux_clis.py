"""Hermetic tests for the auxiliary CLIs added for reference parity: etox
(stdin>stdout word-list scoring), expressivity_pauserate (pause/rate
aggregation — Spearman checked against scipy), and the streaming evaluator's
pluggable ASR-BLEU quality scorer (reference
cli/toxicity/etox/etox.py, cli/expressivity/evaluate/post_process_pauserate.py,
cli/streaming/scorers/seamless_quality_scorer.py)."""

import io
import json
import sys

import numpy as np
import pytest


def test_etox_cli_stdin_stdout(tmp_path, monkeypatch):
    (tmp_path / "eng_twl.txt").write_text("badword\nevil phrase\n")
    out = io.StringIO()
    monkeypatch.setattr(sys, "argv", [
        "etox", "eng", "--etox_dataset", str(tmp_path)])
    monkeypatch.setattr(sys, "stdin",
                        io.StringIO("hello there\nso badword much\n"))
    # no monkeypatching: the real _load_checker is hermetic here — the dataset
    # is an explicit local dir and the mintox card's sp_model (a URL) is only
    # resolved for SP_LANGS, which eng is not
    from seamless_communication_tpu.cli import etox as etox_cli

    monkeypatch.setattr(sys, "stdout", out)
    try:
        etox_cli.main()
    finally:
        monkeypatch.setattr(sys, "stdout", sys.__stdout__)
    lines = out.getvalue().strip().split("\n")
    assert lines[0] == "text\ttoxicity\tbad_words"
    assert lines[1].endswith("\t0\t")
    assert "\t1\tbadword" in lines[2]


def test_pauserate_math(tmp_path):
    from seamless_communication_tpu.cli.expressivity_pauserate import (
        get_pause, get_rate,
    )

    pause = tmp_path / "pause.tsv"
    pause.write_text(
        "total_weight\twmean_duration_score\twmean_alignment_score\t"
        "wmean_joint_score\n"
        "1.0\t0.5\t0.6\t0.4\n"
        "3.0\t0.9\t0.2\t0.8\n")
    m = get_pause(str(pause))
    assert m["wmean_duration_score"] == pytest.approx(0.25 * 0.5 + 0.75 * 0.9)

    rng = np.random.default_rng(0)
    src = rng.random(20)
    tgt = src * 2.0 + rng.random(20) * 0.1
    s_tsv, t_tsv = tmp_path / "src.tsv", tmp_path / "tgt.tsv"
    for path, vals in ((s_tsv, src), (t_tsv, tgt)):
        path.write_text("id\tspeech_rate_syllable\n" + "\n".join(
            f"u{i}\t{v}" for i, v in enumerate(vals)))
    got = get_rate(str(t_tsv), str(s_tsv))
    import scipy.stats
    want = scipy.stats.spearmanr(src, tgt).correlation
    assert got == pytest.approx(want, abs=1e-9)


def test_prepare_mexpresso_manifest(tmp_path):
    """build_en_manifest_from_oss on a synthetic Expresso layout: style
    whitelist, <tag> stripping, 48 kHz -> 16 kHz mono conversion
    (reference prepare_mexpresso.py:73-145)."""
    from seamless_communication_tpu.audio.wav import read_wav, write_wav
    from seamless_communication_tpu.cli.prepare_mexpresso import (
        build_en_manifest_from_oss,
    )

    root = tmp_path / "expresso"
    uids = [("ex01_happy_00001", "happy", "hello <laugh> there"),
            ("ex01_whisper_00002", "whisper", "<breath> soft words"),
            ("ex02_angry_00003", "angry", "not in whitelist")]
    lines = []
    for uid, style, text in uids:
        spk, base = uid.split("_")[0], style.split("_")[0]
        wav_dir = root / "audio_48khz" / "read" / spk / base / "base"
        wav_dir.mkdir(parents=True, exist_ok=True)
        write_wav(str(wav_dir / f"{uid}.wav"),
                  np.zeros(4800, np.float32), 48000)
        lines.append(f"{uid}\t{text}")
    (root / "read_transcriptions.txt").write_text("\n".join(lines) + "\n")

    rows = build_en_manifest_from_oss(root, tmp_path / "out")
    assert [r["id"] for r in rows] == ["ex01_happy_00001",
                                       "ex01_whisper_00002"]
    assert rows[0]["text"] == "hello there"          # <laugh> stripped
    assert rows[1]["text"] == "soft words"
    wav, sr = read_wav(rows[0]["audio"])
    assert sr == 16000 and wav.shape[0] == 1600      # 4800 @48k -> 1600 @16k
    assert (tmp_path / "out" / "en_manifest.tsv").exists()


def test_streaming_evaluator_asr_bleu_plugin():
    """evaluate_streaming(transcribe=...) concatenates emitted speech and
    scores ASR-BLEU with the pluggable transcriber."""
    from seamless_communication_tpu.streaming.agents.common import (
        SpeechSegment,
    )
    from seamless_communication_tpu.streaming.evaluator import (
        evaluate_streaming,
    )

    class FakeSession:
        def __init__(self, pipeline, **kw):
            pass

        def run(self, wav):
            yield 0, SpeechSegment(content=np.ones(160, np.float32),
                                   sample_rate=16000, finished=False)
            yield 1, SpeechSegment(content=np.ones(160, np.float32),
                                   sample_rate=16000, finished=True)

    calls = {}

    def transcribe(wavs):
        calls["n"] = len(wavs)
        calls["samples"] = [len(w) for w in wavs]
        return ["hello world this is just fine"] * len(wavs)

    import seamless_communication_tpu.streaming.pipeline as pl
    real_session = pl.StreamingSession
    pl.StreamingSession = FakeSession
    try:
        metrics = evaluate_streaming(
            lambda: None, [np.zeros(16000, np.float32)],
            references=["hello world this is just fine"], output_is_speech=True,
            transcribe=transcribe)
    finally:
        pl.StreamingSession = real_session
    assert calls == {"n": 1, "samples": [320]}
    assert metrics["asr_bleu"] == pytest.approx(100.0)
    assert metrics["EndOffset_ms"] is not None
