"""Translator — single entry point for S2ST / S2TT / T2ST / T2TT / ASR
(reference inference/translator.py:53-428).

Pipeline: audio decode -> fbank (80-mel, 2^15 scale, per-utterance standardize) or
text tokenize -> UnitYGenerator (beam text + T2U) -> unit vocoder -> waveform.
Optional MinTox re-decode hook mirrors translator.py:360-379.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import List, Optional, Sequence, Union

import numpy as np

import jax.numpy as jnp

from seamless_communication_tpu.audio.fbank import (
    FbankConfig, fbank_numpy, normalize_per_mel_bin, num_frames,
)
from seamless_communication_tpu.audio.wav import read_wav, resample
from seamless_communication_tpu.inference.generator import (
    SequenceGeneratorOptions, UnitYGenerator, _bucket,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.models.vocoder.codehifigan import (
    CodeHifiGanConfig, code_hifigan_forward,
)
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer


class Task(enum.Enum):
    S2ST = enum.auto()
    S2TT = enum.auto()
    T2ST = enum.auto()
    T2TT = enum.auto()
    ASR = enum.auto()


class Modality(enum.Enum):
    SPEECH = "speech"
    TEXT = "text"


def get_modalities_from_task_str(task_str: str) -> tuple[Modality, Modality]:
    """reference translator.py:198-213"""
    try:
        task = Task[task_str.upper()]
    except KeyError:
        valid = ", ".join(t.name.lower() for t in Task)
        raise ValueError(f"unknown task {task_str!r}; expected one of: {valid}") from None
    if task is Task.S2ST:
        return Modality.SPEECH, Modality.SPEECH
    if task is Task.S2TT or task is Task.ASR:
        return Modality.SPEECH, Modality.TEXT
    if task is Task.T2ST:
        return Modality.TEXT, Modality.SPEECH
    return Modality.TEXT, Modality.TEXT


@dataclass
class BatchedSpeechOutput:
    """reference translator.py:66-77"""
    units: List[List[int]]
    audio_wavs: List[np.ndarray]
    sample_rate: int = 16000


@dataclass
class FbankInput:
    """Precomputed RAW log-mel features (e.g. from the native C++ loader,
    native/dataloader.cpp) — predict() applies the model card's fbank
    normalization itself. fbank (B, T, n_mels) zero-padded, lengths (B,);
    length 0 marks a corrupted input (reference evaluate.py:205-245)."""
    fbank: np.ndarray
    lengths: np.ndarray


class Translator:
    def __init__(self, params: dict, cfg: UnitYConfig,
                 text_tokenizer: NllbTokenizer,
                 unit_tokenizer: Optional[UnitTokenizer] = None,
                 char_tokenizer: Optional[CharTokenizer] = None,
                 vocoder_params: Optional[dict] = None,
                 vocoder_cfg: Optional[CodeHifiGanConfig] = None,
                 lang_spkr_idx_map: Optional[dict] = None,
                 text_opts: Optional[SequenceGeneratorOptions] = None,
                 unit_opts: Optional[SequenceGeneratorOptions] = None,
                 fbank_cfg: FbankConfig = FbankConfig(),
                 normalize_fbank: str = "utterance",
                 apply_mintox: bool = False,
                 etox_checker=None):
        self.cfg = cfg
        self.params = params
        self.text_tokenizer = text_tokenizer
        self.vocoder_params = vocoder_params
        self.vocoder_cfg = vocoder_cfg
        self.lang_spkr_idx_map = lang_spkr_idx_map or {}
        self.fbank_cfg = fbank_cfg
        self.normalize_fbank = normalize_fbank
        # MinTox toxicity mitigation (reference translator.py:128,262-315):
        # detect added toxicity vs the source, re-generate offending items
        # with the banned-sequence processor inside the compiled beam
        self.apply_mintox = apply_mintox
        self.etox_checker = etox_checker
        if apply_mintox and etox_checker is None:
            raise ValueError("apply_mintox=True requires an etox_checker "
                             "(toxicity.etox.ETOXBadWordChecker)")
        self.generator = UnitYGenerator(params, cfg, text_tokenizer, unit_tokenizer,
                                        char_tokenizer, text_opts, unit_opts)

    # ---------------- input preparation ----------------

    def _audio_to_fbank(self, audio: Union[str, np.ndarray, Sequence],
                        sample_rate: int = 16000) -> tuple[np.ndarray, np.ndarray]:
        wavs = []
        items = audio if isinstance(audio, (list, tuple)) else [audio]
        for a in items:
            if isinstance(a, str):
                w, r = read_wav(a)
                w = resample(w, r, self.fbank_cfg.sample_rate)
            else:
                w = resample(np.asarray(a, np.float32), sample_rate,
                             self.fbank_cfg.sample_rate)
            wavs.append(w)
        feats = [fbank_numpy(w, self.fbank_cfg) for w in wavs]
        if self.normalize_fbank == "utterance":
            # fairseq2 WaveformToFbankConverter standardize=True: per-utterance
            # global mean/std (translator.py:136-146); zero-frame inputs (an
            # upstream stage emitted no audio) pass through unnormalized
            # instead of warning on an empty mean
            feats = [((f - f.mean()) / (f.std() + 1e-7)).astype(np.float32)
                     if f.size else f.astype(np.float32)
                     for f in feats]
        elif self.normalize_fbank == "per_mel_bin":
            feats = [normalize_per_mel_bin(f) for f in feats]
        lens = np.array([f.shape[0] for f in feats], np.int32)
        return self._pad_feats(feats, lens)

    def _normalize_fbank_batch(self, fb: FbankInput
                               ) -> tuple[np.ndarray, np.ndarray]:
        """Apply the card's fbank normalization to precomputed raw log-mels,
        using only the valid frames of each item."""
        lens = np.asarray(fb.lengths, np.int32)
        feats = [np.asarray(fb.fbank[i, :L], np.float32)
                 for i, L in enumerate(lens)]
        if self.normalize_fbank == "utterance":
            feats = [((f - f.mean()) / (f.std() + 1e-7)).astype(np.float32)
                     if f.size else f for f in feats]
        elif self.normalize_fbank == "per_mel_bin":
            feats = [normalize_per_mel_bin(f) if f.size else f for f in feats]
        return self._pad_feats(feats, np.maximum(lens, 1))

    def _pad_feats(self, feats, lens) -> tuple[np.ndarray, np.ndarray]:
        T = _bucket(int(lens.max()), 128)
        out = np.zeros((len(feats), T, self.fbank_cfg.num_mel_bins), np.float32)
        for i, f in enumerate(feats):
            out[i, :f.shape[0]] = f
        return out, lens

    # ---------------- main entry ----------------

    def predict(self, input, task_str: str, tgt_lang: str, *,
                src_lang: Optional[str] = None,
                sample_rate: int = 16000,
                spkr: int = -1,
                duration_factor: float = 1.0,
                text_generation_opts: Optional[SequenceGeneratorOptions] = None,
                banned_sequences: Optional[tuple] = None,
                ngram_filtering: bool = False,
                max_unit_len: int = 2048,
                prosody_encoder_input: Optional[np.ndarray] = None,
                prosody_input_lens: Optional[np.ndarray] = None,
                src_text: Optional[str] = None,
                unit_generation_opts: Optional[SequenceGeneratorOptions] = None,
                _apply_mintox: Optional[bool] = None):
        """Returns (texts: List[str], BatchedSpeechOutput | None)
        (reference translator.py:215-428)."""
        in_mod, out_mod = get_modalities_from_task_str(task_str)

        if in_mod is Modality.SPEECH:
            if isinstance(input, FbankInput):
                fbank, flens = self._normalize_fbank_batch(input)
            else:
                fbank, flens = self._audio_to_fbank(input, sample_rate)
            enc = self.generator._encode_speech_fn()(
                self.params, jnp.asarray(fbank), jnp.asarray(flens))
        else:
            if src_lang is None:
                raise ValueError("src_lang required for text input")
            texts = input if isinstance(input, (list, tuple)) else [input]
            ids = [self.text_tokenizer.encode_source(t, src_lang) for t in texts]
            lens = np.array([len(i) for i in ids], np.int32)
            T = _bucket(int(lens.max()), 16)
            arr = np.full((len(ids), T), self.text_tokenizer.vocab_info.pad_idx,
                          np.int32)
            for i, s in enumerate(ids):
                arr[i, :len(s)] = s
            enc = self.generator._encode_text_fn()(
                self.params, jnp.asarray(arr), jnp.asarray(lens))

        # ASR: target language == source language
        text_lang = tgt_lang if Task[task_str.upper()] is not Task.ASR else (
            src_lang or tgt_lang)

        tokens, tok_lens, scores = self.generator.generate_text(
            enc, text_lang, banned=banned_sequences,
            opts_override=text_generation_opts)

        texts_out = []
        for b in range(tokens.shape[0]):
            seq = tokens[b, :tok_lens[b]]
            texts_out.append(self.text_tokenizer.decode(seq))

        do_mintox = (self.apply_mintox if _apply_mintox is None
                     else _apply_mintox)
        if out_mod is Modality.TEXT:
            if do_mintox:
                texts_out, _ = self._run_mintox(
                    input, task_str, tgt_lang, src_lang, src_text, texts_out,
                    None, sample_rate=sample_rate,
                    banned_base=banned_sequences)
            return texts_out, None

        # expressive models: gcmvn-normalized source fbank conditions the T2U
        # prosody projection + FiLM (reference translator.py:171,332)
        pf = pl = None
        if prosody_encoder_input is not None:
            pf = np.asarray(prosody_encoder_input, np.float32)
            if pf.ndim == 2:
                pf = pf[None]
            pl = (np.asarray(prosody_input_lens, np.int32)
                  if prosody_input_lens is not None
                  else np.full((pf.shape[0],), pf.shape[1], np.int32))
        units = self.generator.generate_units(
            tokens, tok_lens, enc, tgt_lang, duration_factor=duration_factor,
            max_unit_len=max_unit_len, ngram_filtering=ngram_filtering,
            prosody_fbank=pf, prosody_lens=pl,
            unit_opts_override=unit_generation_opts)

        if do_mintox:
            texts_out, units = self._run_mintox(
                input, task_str, tgt_lang, src_lang, src_text, texts_out,
                units, sample_rate=sample_rate, banned_base=banned_sequences,
                duration_factor=duration_factor, max_unit_len=max_unit_len,
                ngram_filtering=ngram_filtering,
                prosody_encoder_input=prosody_encoder_input,
                prosody_input_lens=prosody_input_lens)

        audio_wavs: List[np.ndarray] = []
        if self.vocoder_params is not None:
            audio_wavs = self.synthesize(units, tgt_lang, spkr=spkr)
        return texts_out, BatchedSpeechOutput(units=units, audio_wavs=audio_wavs)

    # ---------------- MinTox (reference translator.py:262-315) -------------

    def _run_mintox(self, input, task_str: str, tgt_lang: str,
                    src_lang: Optional[str], src_text: Optional[str],
                    texts_out, units, *, sample_rate: int, banned_base,
                    **regen_kwargs):
        """Detect added toxicity vs the source text and re-generate offending
        items with the toxic words banned inside the compiled beam. Source
        text comes from ``src_text``, the text input itself, or ASR."""
        from seamless_communication_tpu.inference.translator import (
            get_modalities_from_task_str,
        )
        from seamless_communication_tpu.toxicity.mintox import mintox_pipeline

        in_mod, _ = get_modalities_from_task_str(task_str)
        if src_text is not None:
            src_texts = [str(src_text)] * len(texts_out)
        elif in_mod is Modality.TEXT:
            items = input if isinstance(input, (list, tuple)) else [input]
            src_texts = [str(t) for t in items]
        else:
            if src_lang is None:
                raise ValueError("`src_lang` must be specified when "
                                 "`apply_mintox` is True (or pass src_text)")
            src_texts, _ = self.predict(input, "asr", src_lang,
                                        src_lang=src_lang,
                                        sample_rate=sample_rate,
                                        _apply_mintox=False)

        def rerun(indices, banned):
            # re-generate the whole batch with the bans active (bucketed jit
            # programs are per batch size; CLIs run B=1), take the subset.
            # banned is ((N,M) right-aligned int32 array, (N,) lengths) —
            # merge with any caller-provided base bans
            if banned_base is not None:
                a1, l1 = banned
                a0, l0 = banned_base
                M = max(a0.shape[1], a1.shape[1])
                pad = lambda a: np.pad(a, ((0, 0), (M - a.shape[1], 0)),
                                       constant_values=-1)
                banned = (np.concatenate([pad(np.asarray(a0)),
                                          pad(np.asarray(a1))]),
                          np.concatenate([np.asarray(l0), np.asarray(l1)]))
            texts2, speech2 = self.predict(
                input, task_str, tgt_lang, src_lang=src_lang,
                sample_rate=sample_rate, banned_sequences=banned,
                _apply_mintox=False, **regen_kwargs)
            u2 = speech2.units if speech2 is not None else None
            return ([texts2[i] for i in indices],
                    [u2[i] for i in indices] if u2 is not None else None)

        return mintox_pipeline(
            checker=self.etox_checker, text_tokenizer=self.text_tokenizer,
            src_texts=src_texts, original_texts=texts_out,
            original_units=units, src_lang=src_lang or tgt_lang,
            tgt_lang=tgt_lang, rerun_fn=rerun)

    # ---------------- vocoder ----------------

    def synthesize(self, units: List[List[int]], tgt_lang: str, *,
                   spkr: int = -1, dur_prediction: bool = True) -> List[np.ndarray]:
        """Unit lists -> waveforms (reference translator.py:406-420 + vocoder.py:15-49)."""
        lang_map = self.lang_spkr_idx_map.get("multilingual", {})
        spkr_map = self.lang_spkr_idx_map.get("multispkr", {})
        lang_id = lang_map.get(tgt_lang, 0)
        spkrs = spkr_map.get(tgt_lang, [0])
        spkr_id = spkrs[spkr] if 0 <= spkr < len(spkrs) else spkrs[-1]

        out = []
        for u in units:
            if len(u) == 0:
                out.append(np.zeros((0,), np.float32))
                continue
            U = _bucket(len(u), 32)
            arr = np.zeros((1, U), np.int32)
            arr[0, :len(u)] = u
            res = code_hifigan_forward(
                self.vocoder_params, self.vocoder_cfg, jnp.asarray(arr),
                jnp.asarray([len(u)]), jnp.asarray([lang_id]),
                jnp.asarray([spkr_id]), dur_prediction=dur_prediction,
                max_unit_len=U * 4)
            wav = np.asarray(res.waveform[0][:int(res.sample_lengths[0])])
            out.append(wav)
        return out
