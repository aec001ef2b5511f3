"""Quality-metric helpers (reference cli/eval_utils/compute_metrics.py:32-371):
BLEU/chrF via sacrebleu (char-level tokenizer for cmn/jpn/tha/lao/mya), WER/CER via
edit distance (jiwer replacement), ASR-BLEU with a pluggable transcriber (reference
uses Whisper; this environment has no Whisper weights — pass any
``transcribe(wavs) -> texts`` callable, e.g. this framework's own ASR)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, List, Optional, Sequence

# reference lang_mapping + get_tokenizer:168 — char-tokenized BLEU languages
CHAR_LEVEL_LANGS = {"cmn", "jpn", "tha", "lao", "mya", "yue", "zho"}


def get_tokenizer(lang: str) -> str:
    return "char" if lang in CHAR_LEVEL_LANGS else "13a"


def compute_corpus_metric_score(hyps: Sequence[str], refs: Sequence[str], *,
                                lang: str = "eng", metric: str = "bleu") -> float:
    import sacrebleu
    if metric == "bleu":
        return float(sacrebleu.corpus_bleu(
            list(hyps), [list(refs)], tokenize=get_tokenizer(lang)).score)
    if metric == "chrf":
        return float(sacrebleu.corpus_chrf(
            list(hyps), [list(refs)], word_order=2).score)
    raise ValueError(f"unknown metric {metric}")


def _edit_distance(a: List[str], b: List[str]) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def compute_asr_error_rate(hyps: Sequence[str], refs: Sequence[str], *,
                           lang: str = "eng") -> float:
    """WER (CER for char-level languages), reference compute_metrics.py:188."""
    char_level = lang in CHAR_LEVEL_LANGS
    errors = total = 0
    for h, r in zip(hyps, refs):
        hs = list(h.strip()) if char_level else h.strip().split()
        rs = list(r.strip()) if char_level else r.strip().split()
        errors += _edit_distance(hs, rs)
        total += len(rs)
    return errors / max(total, 1)


def compute_asr_bleu(audio_wavs: Sequence, refs: Sequence[str], *,
                     transcribe: Callable[[Sequence], List[str]],
                     lang: str = "eng") -> float:
    """ASR-BLEU: transcribe synthesized speech, BLEU vs references
    (reference compute_asr_bleu:117, whisper temperature 0 beam 1)."""
    hyps = transcribe(audio_wavs)
    return compute_corpus_metric_score(hyps, refs, lang=lang)


def compute_quality_metrics(hyps: Sequence[str], refs: Sequence[str], *,
                            lang: str, task: str, output_path: Optional[str] = None
                            ) -> dict:
    out = {"bleu": compute_corpus_metric_score(hyps, refs, lang=lang),
           "chrf": compute_corpus_metric_score(hyps, refs, lang=lang, metric="chrf")}
    if task.upper() == "ASR":
        out["wer"] = compute_asr_error_rate(hyps, refs, lang=lang)
    if output_path:
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(out, f, indent=2)
    return out
