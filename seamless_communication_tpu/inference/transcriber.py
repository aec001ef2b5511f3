"""Transcriber — ASR with word-level timestamps and confidences
(reference inference/transcriber.py:40-428).

The reference hooks the last decoder layer's enc-dec attention weights
(EncDecAttentionsCollect:40-61) and median-filters them to align tokens to source
frames. Here the re-decode pass explicitly returns the last layer's cross-attention
probabilities (no hooks needed in a functional model). Long audio goes through VAD
chunking (segment/vad.py) and optional denoising.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.inference.generator import _bucket
from seamless_communication_tpu.inference.translator import Translator
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.masks import (
    causal_mask, lengths_to_padding_mask, padding_bias,
)
from seamless_communication_tpu.ops.modules import layer_norm, linear
from seamless_communication_tpu.ops.transformer import embedding_frontend
from seamless_communication_tpu.segment.vad import VADSegmenter
from seamless_communication_tpu.text.nllb import NllbTokenizer
from seamless_communication_tpu.text.spm import SPM_SPACE


@dataclass
class TranscriptionToken:
    text: str
    time_s: float
    prob: float


@dataclass
class Transcription:
    tokens: List[TranscriptionToken] = field(default_factory=list)

    @property
    def text(self) -> str:
        return "".join(t.text for t in self.tokens).replace(SPM_SPACE, " ").strip()

    def words(self) -> List[TranscriptionToken]:
        """Merge subword tokens into words at ▁ boundaries; word time = first
        subword's, prob = min over subwords."""
        words: List[TranscriptionToken] = []
        for t in self.tokens:
            if t.text.startswith(SPM_SPACE) or not words:
                words.append(TranscriptionToken(t.text.replace(SPM_SPACE, ""),
                                                t.time_s, t.prob))
            else:
                words[-1].text += t.text
                words[-1].prob = min(words[-1].prob, t.prob)
        return [w for w in words if w.text]


def decode_with_cross_attn(params: dict, cfg: UnitYConfig, ids: jax.Array,
                           enc: "unity.EncoderOutput", *,
                           self_lengths: Optional[jax.Array] = None):
    """Full-seq text decode also returning the LAST layer's cross-attention
    probabilities (B, H, T, S)."""
    tcfg = cfg.nllb.dec_cfg()
    x = embedding_frontend(params["text_decoder"]["embed"], ids, tcfg,
                           padding_mask=(lengths_to_padding_mask(self_lengths,
                                                                 ids.shape[1])
                                         if self_lengths is not None else None))
    T = x.shape[1]
    self_bias = causal_mask(T)[None, None]
    cross_bias = padding_bias(enc.padding_mask)
    stack = params["text_decoder"]["stack"]

    def body(h, layer_p):
        z = layer_norm(layer_p["self_attn_layer_norm"], h)
        h = h + attn_ops.multi_head_attention(layer_p["self_attn"], z, z,
                                              tcfg.num_heads, bias=self_bias)
        z = layer_norm(layer_p["cross_attn_layer_norm"], h)
        kv = attn_ops.cross_attention_precompute(layer_p["cross_attn"], enc.seqs,
                                                 tcfg.num_heads)
        y, probs = attn_ops.cross_attention_step(layer_p["cross_attn"], z, kv,
                                                 tcfg.num_heads, bias=cross_bias,
                                                 return_probs=True)
        h = h + y
        z = layer_norm(layer_p["ffn"]["layer_norm"], h)
        z = jax.nn.relu(linear(layer_p["ffn"]["inner_proj"], z))
        h = h + linear(layer_p["ffn"]["output_proj"], z)
        return h, probs

    out, all_probs = jax.lax.scan(body, x, stack["layers"])
    out = layer_norm(stack["layer_norm"], out)
    from seamless_communication_tpu.ops.transformer import tied_projection
    logits = tied_projection(params["text_decoder"]["embed"], out)
    return logits, all_probs[-1]


def _median_filter(x: np.ndarray, k: int = 7) -> np.ndarray:
    """Median filter along the last (source) axis (reference transcriber
    attention smoothing)."""
    if k <= 1:
        return x
    pad = k // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    out = np.empty_like(x)
    for i in range(x.shape[-1]):
        out[..., i] = np.median(xp[..., i:i + k], axis=-1)
    return out


class Transcriber:
    """ASR with timestamps. Wraps a Translator-compatible model."""

    # seconds of source audio per encoder frame: 10 ms fbank hop x 2 (stack) x 8
    # (adaptor stride)
    SECONDS_PER_ENC_FRAME = 0.16

    def __init__(self, params: dict, cfg: UnitYConfig,
                 text_tokenizer: NllbTokenizer, *,
                 denoiser=None, chunk_size_sec: float = 20.0):
        self.params = params
        self.cfg = cfg
        self.text_tokenizer = text_tokenizer
        self.denoiser = denoiser
        self.segmenter = VADSegmenter(chunk_size_sec=chunk_size_sec)
        self.translator = Translator(params, cfg, text_tokenizer)
        self._attn_fn = jax.jit(
            lambda p, ids, seqs, lens, idlens: decode_with_cross_attn(
                p, cfg, ids, unity.EncoderOutput(seqs, lens), self_lengths=idlens))

    def transcribe(self, waveform: np.ndarray, src_lang: str, *,
                   sample_rate: int = 16000, denoise: bool = False
                   ) -> Transcription:
        wav = np.asarray(waveform, np.float32)
        if denoise and self.denoiser is not None:
            wav = self.denoiser.denoise(wav, sample_rate)

        chunk_samples = int(self.segmenter.chunk_size_sec * sample_rate)
        if len(wav) > chunk_samples:
            spans = self.segmenter.segment_long_input(wav) or [(0, len(wav))]
        else:
            spans = [(0, len(wav))]

        result = Transcription()
        for start, end in spans:
            seg = wav[start:end]
            if len(seg) < 400:
                continue
            part = self._transcribe_segment(seg, src_lang)
            offset = start / sample_rate
            for t in part.tokens:
                result.tokens.append(TranscriptionToken(t.text, t.time_s + offset,
                                                        t.prob))
        return result

    def lid_scores(self, waveform: np.ndarray, *, topk: int = 5) -> dict:
        """Language identification: probability over language tokens at the first
        decode position given prefix [eos] (reference unity_lib Result LID scores,
        ggml/examples/unity/unity_lib.h:20-25)."""
        fbank, flens = self.translator._audio_to_fbank(np.asarray(waveform,
                                                                  np.float32))
        enc = self.translator.generator._encode_speech_fn()(
            self.params, jnp.asarray(fbank), jnp.asarray(flens))
        from seamless_communication_tpu.models.nllb.model import (
            text_decoder_cache, text_decoder_step,
        )
        cache = text_decoder_cache(self.params["text_decoder"], self.cfg.nllb,
                                   enc.seqs, 4)
        logits, _ = text_decoder_step(
            self.params["text_decoder"],
            jnp.full((enc.seqs.shape[0], 1), self.cfg.nllb.eos_idx, jnp.int32),
            cache, jnp.int32(0), self.cfg.nllb,
            enc_padding_mask=enc.padding_mask)
        probs = np.asarray(jax.nn.softmax(logits[0]))
        lang_ids = {tok: tid for tok, tid in self.text_tokenizer.lang_to_id.items()}
        scores = {tok: float(probs[tid]) for tok, tid in lang_ids.items()}
        top = dict(sorted(scores.items(), key=lambda kv: -kv[1])[:topk])
        return top

    def _transcribe_segment(self, wav: np.ndarray, src_lang: str) -> Transcription:
        fbank, flens = self.translator._audio_to_fbank(wav)
        enc = self.translator.generator._encode_speech_fn()(
            self.params, jnp.asarray(fbank), jnp.asarray(flens))
        tokens, tok_lens, _ = self.translator.generator.generate_text(enc, src_lang)

        T = _bucket(int(tok_lens.max()), 16)
        logits, cross = self._attn_fn(self.params, jnp.asarray(tokens[:, :T]),
                                      enc.seqs, enc.lengths,
                                      jnp.asarray(tok_lens))
        probs = jax.nn.softmax(logits, axis=-1)
        cross = np.asarray(cross)               # (B, H, T, S)
        attn = _median_filter(cross.mean(axis=1))  # (B, T, S)

        out = Transcription()
        L = int(tok_lens[0])
        enc_len = int(enc.lengths[0])
        for t in range(1, L - 1):               # skip [eos, lang] prefix and final eos
            tok_id = int(tokens[0, t + 1]) if t + 1 < L else None
            if tok_id is None or tok_id in (0, 2, 3):
                continue
            # attention row of the step that PRODUCED token t+1 is row t
            frame = int(np.argmax(attn[0, t, :enc_len]))
            p = float(probs[0, t, tok_id])
            out.tokens.append(TranscriptionToken(
                self.text_tokenizer.id_to_token(tok_id),
                frame * self.SECONDS_PER_ENC_FRAME, p))
        return out
