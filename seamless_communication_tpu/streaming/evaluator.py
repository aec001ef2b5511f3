"""Streaming evaluator: SimulEval-compatible latency + quality scoring
(reference cli/streaming/evaluate.py:33-104; simuleval latency scorers).

Metrics:
  - AL  (Average Lagging, Ma et al. 2019) over spm-unit target tokens (S2TT)
  - LAAL (Length-Adaptive Average Lagging)
  - StartOffset / EndOffset in ms (S2ST)
  - quality via a pluggable scorer (sacrebleu BLEU on text; ASR-BLEU needs an ASR
    model — pluggable, reference uses Whisper)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np


@dataclass
class StreamingInstance:
    """Delay bookkeeping for one utterance."""
    source_duration_ms: float
    # per emitted target token: elapsed source time (ms) when it was emitted
    delays_ms: List[float] = field(default_factory=list)
    target_tokens: List[str] = field(default_factory=list)
    target_text: str = ""
    # speech output bookkeeping
    first_wav_offset_ms: Optional[float] = None
    last_wav_end_ms: Optional[float] = None
    wav_samples: int = 0
    wav_chunks: List[np.ndarray] = field(default_factory=list)
    wav_sample_rate: int = 16000


def average_lagging(delays_ms: List[float], source_ms: float, target_len: int, *,
                    length_adaptive: bool = False) -> float:
    """AL (Ma et al. 2019); LAAL uses max(|y|, |y*|) normalization
    (simuleval latency scorer semantics)."""
    if target_len == 0 or not delays_ms:
        return 0.0
    tgt_for_rate = max(target_len, len(delays_ms)) if length_adaptive else target_len
    rate = source_ms / tgt_for_rate
    al = 0.0
    tau = 0
    for i, d in enumerate(delays_ms):
        al += d - i * rate
        tau = i + 1
        if d >= source_ms:
            break
    return al / max(tau, 1)


def score_streaming_text(instances: List[StreamingInstance],
                         references: Optional[List[str]] = None) -> dict:
    """S2TT streaming metrics: AL + LAAL, plus BLEU when references are given
    (latency is reference-free; reference evaluate.py:70)."""
    al = float(np.mean([
        average_lagging(i.delays_ms, i.source_duration_ms, len(i.target_tokens))
        for i in instances]))
    laal = float(np.mean([
        average_lagging(i.delays_ms, i.source_duration_ms, len(i.target_tokens),
                        length_adaptive=True)
        for i in instances]))
    out = {"AL_ms": al, "LAAL_ms": laal}
    if references is not None:
        import sacrebleu
        hyps = [i.target_text.strip() for i in instances]
        out["bleu"] = sacrebleu.corpus_bleu(hyps, [references]).score
    return out


def score_streaming_speech(instances: List[StreamingInstance]) -> dict:
    """S2ST streaming latency: StartOffset / EndOffset in ms
    (reference evaluate.py:91-93)."""
    start = [i.first_wav_offset_ms for i in instances
             if i.first_wav_offset_ms is not None]
    end = [i.last_wav_end_ms - i.source_duration_ms for i in instances
           if i.last_wav_end_ms is not None]
    return {
        "StartOffset_ms": float(np.mean(start)) if start else float("nan"),
        "EndOffset_ms": float(np.mean(end)) if end else float("nan"),
    }


def evaluate_streaming(pipeline_factory: Callable, waveforms: List[np.ndarray], *,
                       references: Optional[List[str]] = None,
                       tgt_lang: str = "eng", segment_size_ms: int = 320,
                       sample_rate: int = 16000,
                       output_is_speech: bool = False,
                       transcribe: Optional[Callable] = None) -> dict:
    """Run the pipeline over a dataset of waveforms and compute metrics.

    ``pipeline_factory()`` must return a fresh AgentPipeline per utterance.
    ``transcribe`` (wavs -> texts; e.g. Translator ASR or a whisper wrapper)
    adds ASR-BLEU for speech output when ``references`` are given — the
    reference's SimulEval quality scorer
    (cli/streaming/scorers/seamless_quality_scorer.py:24-136).
    """
    from seamless_communication_tpu.streaming.pipeline import StreamingSession
    from seamless_communication_tpu.streaming.agents.common import (
        SpeechSegment, TextSegment,
    )

    instances = []
    for wav in waveforms:
        duration_ms = len(wav) / sample_rate * 1000.0
        inst = StreamingInstance(source_duration_ms=duration_ms)
        session = StreamingSession(pipeline_factory(),
                                   segment_size_ms=segment_size_ms,
                                   sample_rate=sample_rate, tgt_lang=tgt_lang)
        for chunk_idx, seg in session.run(wav):
            elapsed_ms = min((chunk_idx + 1) * segment_size_ms, duration_ms)
            if isinstance(seg, TextSegment) and isinstance(seg.content, str):
                words = [w for w in seg.content.split() if w]
                for w in words:
                    inst.delays_ms.append(elapsed_ms)
                    inst.target_tokens.append(w)
                inst.target_text += seg.content
            elif isinstance(seg, SpeechSegment) and seg.content is not None:
                n = np.asarray(seg.content).size
                if n > 0:
                    if inst.first_wav_offset_ms is None:
                        inst.first_wav_offset_ms = elapsed_ms
                    # output duration must use the OUTPUT sample rate (the
                    # vocoder's — 24 kHz for the default PRETSSEL), not the
                    # 16 kHz source rate
                    out_sr = getattr(seg, "sample_rate", None) or sample_rate
                    inst.wav_samples += n
                    inst.last_wav_end_ms = (elapsed_ms
                                            + inst.wav_samples / out_sr * 1000.0)
                    inst.wav_sample_rate = out_sr
                    if transcribe is not None:
                        inst.wav_chunks.append(
                            np.asarray(seg.content, np.float32).reshape(-1))
        instances.append(inst)

    metrics: dict = {}
    if output_is_speech:
        metrics.update(score_streaming_speech(instances))
        if transcribe is not None and references is not None:
            from seamless_communication_tpu.cli.eval_utils import (
                compute_asr_bleu,
            )
            from seamless_communication_tpu.audio.wav import resample

            # resample per instance: an instance that emitted no speech keeps
            # the 16 kHz default, so instance 0's rate can't stand in for the
            # batch (e.g. PRETSSEL emits 24 kHz)
            wavs = []
            for inst in instances:
                w = (np.concatenate(inst.wav_chunks) if inst.wav_chunks
                     else np.zeros(160, np.float32))
                if inst.wav_sample_rate != 16000:
                    w = resample(w, inst.wav_sample_rate, 16000)
                wavs.append(w)
            metrics["asr_bleu"] = compute_asr_bleu(
                wavs, references, transcribe=transcribe, lang=tgt_lang)
    if not output_is_speech:
        metrics.update(score_streaming_text(instances, references))
    metrics["num_instances"] = len(instances)
    return metrics
