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


# ---------------------------------------------------------------------------
# Whisper-style text normalizers (reference compute_metrics.py:91-115 uses
# whisper.normalizers; the real package is preferred when installed, with a
# faithful-subset fallback otherwise)
# ---------------------------------------------------------------------------

def whisper_normalize_text(text: str, lang: str = "eng") -> str:
    """EnglishTextNormalizer for eng, BasicTextNormalizer otherwise
    (reference whisper_normalize_series, compute_metrics.py:91-115)."""
    try:
        if lang == "eng":
            from whisper.normalizers import EnglishTextNormalizer
            return str(EnglishTextNormalizer()(text))
        from whisper.normalizers import BasicTextNormalizer
        return str(BasicTextNormalizer()(text))
    except ImportError:
        return _basic_normalize(text, english=(lang == "eng"))


_ENG_CONTRACTIONS = {
    "won't": "will not", "can't": "can not", "n't": " not", "'re": " are",
    "'ve": " have", "'ll": " will", "'m": " am", "let's": "let us",
}


def _basic_normalize(text: str, *, english: bool = False) -> str:
    """Subset of whisper's BasicTextNormalizer (lowercase, strip bracketed
    spans and diacritics, symbols -> space) plus the most common English
    contraction expansions."""
    import re
    import unicodedata

    text = text.lower()
    text = re.sub(r"[<\[][^>\]]*[>\]]", " ", text)
    text = re.sub(r"\(([^)]+?)\)", " ", text)
    if english:
        for k, v in _ENG_CONTRACTIONS.items():
            text = text.replace(k, v)
    text = unicodedata.normalize("NFKD", text)
    text = "".join(c for c in text if not unicodedata.combining(c))
    text = "".join(c if (c.isalnum() or c.isspace()) else " " for c in text)
    return " ".join(text.split())


def make_whisper_transcriber(model_name_or_path: str, *, lang: str = "eng",
                             device: str = "cpu"
                             ) -> Callable[[Sequence], List[str]]:
    """Build a ``transcribe(wavs) -> texts`` callable from a (local) HF Whisper
    checkpoint, with the reference's decoding settings: temperature 0, beam 1
    (greedy), no fallback (reference transcribe_series_audio, compute_metrics.py
    :39-88). Raises ImportError/OSError when transformers or the weights are
    unavailable — callers fall back to their own ASR."""
    import torch
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    processor = WhisperProcessor.from_pretrained(model_name_or_path)
    model = WhisperForConditionalGeneration.from_pretrained(
        model_name_or_path).to(device).eval()
    lang2 = LANG3_TO_LANG2.get(lang, lang[:2])

    def transcribe(wavs: Sequence) -> List[str]:
        out = []
        for wav in wavs:
            import numpy as np
            feats = processor(np.asarray(wav, np.float32), sampling_rate=16000,
                              return_tensors="pt").input_features.to(device)
            kwargs = {}
            try:
                kwargs["forced_decoder_ids"] = processor.get_decoder_prompt_ids(
                    language=lang2, task="transcribe")
            except (ValueError, KeyError):
                pass
            with torch.no_grad():
                ids = model.generate(feats, num_beams=1, do_sample=False,
                                     **kwargs)
            out.append(processor.batch_decode(ids, skip_special_tokens=True)[0])
        return out

    return transcribe


def make_m4t_transcriber(model_name: str, *, lang: str = "eng",
                         local_hf_path: Optional[str] = None,
                         batch_size: int = 8
                         ) -> Callable[[Sequence], List[str]]:
    """This framework's own M4T ASR as a ``transcribe(wavs) -> texts``
    callable — the no-local-whisper fallback shared by the ASR-BLEU/ASR-ETOX
    CLIs. Runs ``Translator.predict`` in fixed-size batches so an arbitrarily
    large eval set never pads into one giant device batch (each chunk is one
    (batch_size, T_max, 80) encoder batch + beam search)."""
    from seamless_communication_tpu.cli.loading import (
        load_unity_model_and_tokenizers,
    )
    from seamless_communication_tpu.inference.translator import Translator

    params, cfg, text_tok, unit_tok, char_tok = \
        load_unity_model_and_tokenizers(model_name, local_hf_path=local_hf_path)
    translator = Translator(params, cfg, text_tok, unit_tok, char_tok)

    def transcribe(wavs: Sequence) -> List[str]:
        out: List[str] = []
        for i in range(0, len(wavs), batch_size):
            texts, _ = translator.predict(list(wavs[i:i + batch_size]),
                                          "asr", lang)
            out.extend(str(t) for t in texts)
        return out

    return transcribe


# reference lang_mapping.py LANG3 -> LANG2 (whisper language codes); the
# high-traffic subset — unlisted codes fall back to the ISO prefix
LANG3_TO_LANG2 = {
    "eng": "en", "spa": "es", "fra": "fr", "deu": "de", "ita": "it",
    "cmn": "zh", "zho": "zh", "jpn": "ja", "kor": "ko", "por": "pt",
    "rus": "ru", "arb": "ar", "hin": "hi", "vie": "vi", "tha": "th",
    "nld": "nl", "pol": "pl", "tur": "tr", "ukr": "uk", "swh": "sw",
    "ben": "bn", "urd": "ur", "ind": "id", "fin": "fi", "swe": "sv",
    "ces": "cs", "ron": "ro", "ell": "el", "heb": "he", "hun": "hu",
    "cat": "ca", "dan": "da", "nor": "no", "slk": "sk", "tgl": "tl",
}


def compute_asr_bleu(audio_wavs: Sequence, refs: Sequence[str], *,
                     transcribe: Optional[Callable[[Sequence], List[str]]] = None,
                     whisper_model_name: Optional[str] = None,
                     lang: str = "eng", normalize: bool = True) -> float:
    """ASR-BLEU: transcribe synthesized speech, BLEU vs references
    (reference compute_asr_bleu:117-186, whisper temperature 0 beam 1,
    whisper text normalizers on both sides).

    ``transcribe`` may be any ``wavs -> texts`` callable (e.g. this framework's
    own ASR); when ``whisper_model_name`` points at an available HF Whisper
    checkpoint it takes precedence, making scores comparable to the
    reference's published ASR-BLEU numbers."""
    if whisper_model_name:
        transcribe = make_whisper_transcriber(whisper_model_name, lang=lang)
    if transcribe is None:
        raise ValueError("need transcribe callable or whisper_model_name")
    hyps = transcribe(audio_wavs)
    if normalize:
        hyps = [whisper_normalize_text(h, lang) for h in hyps]
        refs = [whisper_normalize_text(r, lang) for r in refs]
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
