"""UnitY two-pass generation (reference inference/generator.py:39-364).

Pass 1: beam-search the text hypothesis from the speech (or text) encoder output via
        the compiled beam search (ops/beam_search.py).
Pass 2: re-decode the best hypothesis through the text decoder (full sequence) to get
        decoder features, then run NAR T2U (argmax) or AR T2U (beam search) and
        detokenize units.

Everything device-side is jitted with shape bucketing; host code only does
tokenization and the char-frontend preprocessing.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.models.unity.t2u import (
    ar_t2u_cache, ar_t2u_decoder_step, ar_t2u_encode,
)
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.ops.beam_search import (
    BeamSearchOptions, beam_search, make_banned_sequence_processor,
    make_ngram_repeat_block,
)
from seamless_communication_tpu.text.char_frontend import text_to_char_seqs
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer


def remove_consecutive_repeated_ngrams(seq: list, min_size: int = 1,
                                       max_size: int = 40) -> list:
    """Drop immediately-repeated n-grams from a token list
    (reference generator.py:39-56)."""
    drop = set()
    for n in range(min_size, max_size + 1):
        for i in range(len(seq) - 2 * n + 1):
            if seq[i:i + n] == seq[i + n:i + 2 * n]:
                drop.update(range(i, i + n))
    return [tok for i, tok in enumerate(seq) if i not in drop]


@dataclass
class SequenceGeneratorOptions:
    """Reference inference/generator.py:59-84 defaults."""
    beam_size: int = 5
    soft_max_seq_len: tuple[int, int] = (1, 200)
    hard_max_seq_len: int = 1024
    len_penalty: float = 1.0
    unk_penalty: float = 0.0
    step_processor: Optional[object] = None  # (banned seqs array, lens) tuple
    no_repeat_ngram_size: Optional[int] = None  # NGramRepeatBlockProcessor
    kv_cache_int8: Optional[bool] = None  # None: int8 KV on TPU (the benched
                                          # serving config; error bounded in
                                          # tests/unit/test_quantization.py),
                                          # fp KV elsewhere
    kv_cache_bits: int = 8                # 4: packed-int4 self-KV (half the
                                          # per-step KV HBM read again; lossier
                                          # — opt-in, bench-measured)


def _bucket(n: int, step: int = 64) -> int:
    return max(step, int(math.ceil(n / step)) * step)


def _resolve_kv_int8(opts: SequenceGeneratorOptions) -> bool:
    if opts.kv_cache_int8 is not None:
        return opts.kv_cache_int8
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class UnitYGenerator:
    """Callable two-pass generator over a UnitY parameter pytree."""

    def __init__(self, params: dict, cfg: UnitYConfig,
                 text_tokenizer: NllbTokenizer,
                 unit_tokenizer: Optional[UnitTokenizer] = None,
                 char_tokenizer: Optional[CharTokenizer] = None,
                 text_opts: Optional[SequenceGeneratorOptions] = None,
                 unit_opts: Optional[SequenceGeneratorOptions] = None,
                 dtype=jnp.float32):
        self.params = params
        self.cfg = cfg
        self.text_tokenizer = text_tokenizer
        self.unit_tokenizer = unit_tokenizer
        self.char_tokenizer = char_tokenizer
        self.text_opts = text_opts or SequenceGeneratorOptions()
        self.unit_opts = unit_opts or SequenceGeneratorOptions(
            soft_max_seq_len=(25, 50))
        self.dtype = dtype
        self._jit_cache: dict = {}

    # ---------------- compiled stages ----------------

    def _encode_speech_fn(self):
        if "enc_speech" not in self._jit_cache:
            self._jit_cache["enc_speech"] = jax.jit(
                lambda p, fb, fl: unity.encode_speech(p, self.cfg, fb, fl))
        return self._jit_cache["enc_speech"]

    def _encode_text_fn(self):
        if "enc_text" not in self._jit_cache:
            self._jit_cache["enc_text"] = jax.jit(
                lambda p, ids, lens: unity.encode_text(p, self.cfg, ids, lens))
        return self._jit_cache["enc_text"]

    def _text_beam_fn(self, max_len: int, banned: Optional[tuple],
                      topts: SequenceGeneratorOptions):
        kv_int8 = _resolve_kv_int8(topts)
        kv_bits = topts.kv_cache_bits if kv_int8 else 8
        key = ("text_beam", max_len, banned is not None,
               topts.beam_size, topts.len_penalty, topts.unk_penalty,
               topts.no_repeat_ngram_size, kv_int8, kv_bits)
        if key not in self._jit_cache:
            opts = BeamSearchOptions(
                beam_size=topts.beam_size, max_len=max_len,
                len_penalty=topts.len_penalty,
                unk_penalty=topts.unk_penalty,
                pad_idx=self.cfg.nllb.pad_idx, unk_idx=self.cfg.nllb.unk_idx,
                eos_idx=self.cfg.nllb.eos_idx)
            V = self.cfg.nllb.vocab_size
            K = opts.beam_size

            # candidate mode (fused int8 vocab-projection + top-(2K+1),
            # ops/kernels/vocab_topk.py) is exact but the current Mosaic
            # kernel measured slower than XLA's fused projection (30.6 vs
            # ~0.5 ms/call, docs/performance.md) — opt-in until the kernel's
            # per-tile top-k is restructured. Incompatible with step
            # processors / nonzero unk penalty regardless.
            import os
            cand = (os.environ.get("SEAMLESS_CANDIDATE_BEAM") == "1"
                    and banned is None and not topts.no_repeat_ngram_size
                    and topts.unk_penalty == 0.0)

            def run(params, enc_seqs, enc_lens, prefix, prefix_len, banned_arr,
                    banned_lens):
                enc = unity.EncoderOutput(
                    jnp.repeat(enc_seqs, K, axis=0), jnp.repeat(enc_lens, K, axis=0))
                step_fn, cache_fn = unity.make_text_decode_step(
                    params, self.cfg, enc,
                    candidates=(2 * K + 1) if cand else None)
                procs = []
                if banned_arr is not None:
                    procs.append(make_banned_sequence_processor(banned_arr,
                                                                banned_lens, V))
                if topts.no_repeat_ngram_size:
                    procs.append(make_ngram_repeat_block(
                        topts.no_repeat_ngram_size, V))
                cache = cache_fn(max_len, kv_int8, kv_bits=kv_bits)
                # src_to_step fuses the beam reorder into the decode step's
                # cache pass (ops/transformer.py beam_src) — token-identical,
                # ~1.4 ms/step faster on v2-large
                return beam_search(step_fn, cache, prefix, prefix_len, opts, V,
                                   processors=procs, src_to_step=True,
                                   candidate_mode=cand)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _redecode_fn(self):
        if "redecode" not in self._jit_cache:
            def run(params, ids, id_lens, enc_seqs, enc_lens):
                enc = unity.EncoderOutput(enc_seqs, enc_lens)
                return unity.decode_text(params, self.cfg, ids, enc,
                                         self_lengths=id_lens)
            self._jit_cache["redecode"] = jax.jit(run)
        return self._jit_cache["redecode"]

    def _nar_t2u_fn(self, max_unit_len: int, with_prosody: bool):
        key = ("nar_t2u", max_unit_len, with_prosody)
        if key not in self._jit_cache:
            def run(params, feats, lens, char_ids, char_counts, duration_factor,
                    prosody_fbank, prosody_lens):
                prosody = None
                if with_prosody:
                    # ECAPA embed conditions both prosody_proj and FiLM
                    # (reference generator.py:306-314)
                    prosody = unity.encode_prosody(params, self.cfg,
                                                   prosody_fbank, prosody_lens)
                out = unity.t2u_nar(params, self.cfg, feats, lens, char_ids,
                                    char_counts, max_unit_len=max_unit_len,
                                    duration_factor=duration_factor,
                                    prosody_embed=prosody, film_cond=prosody)
                units = jnp.argmax(out.unit_logits, axis=-1)
                return units, out.unit_lengths, out.durations
            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    def _ar_t2u_fn(self, max_len: int,
                   uopts: Optional[SequenceGeneratorOptions] = None):
        uopts = uopts or self.unit_opts
        kv_int8 = _resolve_kv_int8(uopts)
        key = ("ar_t2u", max_len, uopts.beam_size, uopts.len_penalty,
               uopts.no_repeat_ngram_size, kv_int8)
        if key not in self._jit_cache:
            tcfg = self.cfg.ar_t2u
            opts = BeamSearchOptions(
                beam_size=uopts.beam_size, max_len=max_len,
                len_penalty=uopts.len_penalty,
                pad_idx=tcfg.pad_idx, unk_idx=tcfg.unk_idx, eos_idx=tcfg.eos_idx,
                bos_idx=tcfg.bos_idx)
            V = tcfg.unit_vocab_size
            K = opts.beam_size

            def run(params, feats, lens, prefix, prefix_len):
                from seamless_communication_tpu.ops.transformer import (
                    unstack_layer_params,
                )

                enc, mask = ar_t2u_encode(params["t2u"], tcfg, feats, lens)
                enc_bk = jnp.repeat(enc, K, axis=0)
                mask_bk = jnp.repeat(mask, K, axis=0)
                cache = ar_t2u_cache(params["t2u"], tcfg, enc_bk, max_len,
                                     kv_int8)
                # hoist layer weight slices out of the decode while-loop
                # (same win as the text beam, ops/transformer.py)
                t2u_params = dict(params["t2u"])
                t2u_params["decoder"] = unstack_layer_params(
                    t2u_params["decoder"])

                def step_fn(tok_t, cache, step, beam_src=None):
                    return ar_t2u_decoder_step(t2u_params, tok_t, cache, step,
                                               tcfg, enc_padding_mask=mask_bk,
                                               beam_src=beam_src)

                procs = []
                if uopts.no_repeat_ngram_size:
                    procs.append(make_ngram_repeat_block(
                        uopts.no_repeat_ngram_size, V))
                return beam_search(step_fn, cache, prefix, prefix_len, opts, V,
                                   processors=procs, src_to_step=True)

            self._jit_cache[key] = jax.jit(run)
        return self._jit_cache[key]

    # ---------------- public API ----------------

    def generate_text(self, enc: "unity.EncoderOutput", tgt_lang: str, *,
                      src_len_hint: Optional[int] = None,
                      banned: Optional[tuple] = None,
                      opts_override: Optional[SequenceGeneratorOptions] = None):
        """Beam-search text tokens. Returns (tokens (B, T) np, lengths (B,) np).
        ``opts_override``: per-call generation options (reference predict's
        text_generation_opts); compiled programs are cached per option set."""
        topts = opts_override or self.text_opts
        a, b = topts.soft_max_seq_len
        src = src_len_hint or int(enc.seqs.shape[1])
        max_len = min(topts.hard_max_seq_len, a * src + b)
        max_len = _bucket(max_len)
        prefix = np.tile(self.text_tokenizer.target_prefix(tgt_lang), (enc.seqs.shape[0], 1))
        run = self._text_beam_fn(max_len, banned, topts)
        banned_arr = jnp.asarray(banned[0]) if banned else None
        banned_lens = jnp.asarray(banned[1]) if banned else None
        res = run(self.params, enc.seqs, enc.lengths, jnp.asarray(prefix),
                  jnp.full((prefix.shape[0],), 2, jnp.int32), banned_arr, banned_lens)
        best_tokens = np.asarray(res.tokens[:, 0])
        best_lens = np.asarray(res.lengths[:, 0])
        return best_tokens, best_lens, np.asarray(res.scores[:, 0])

    def generate_units(self, text_tokens: np.ndarray, text_lens: np.ndarray,
                       enc: "unity.EncoderOutput", tgt_lang: str, *,
                       duration_factor: float = 1.0,
                       max_unit_len: int = 2048,
                       ngram_filtering: bool = False,
                       prosody_fbank: Optional[np.ndarray] = None,
                       prosody_lens: Optional[np.ndarray] = None,
                       unit_opts_override: Optional[SequenceGeneratorOptions] = None):
        """Pass 2: re-decode text, run T2U, detokenize to raw units.

        ``prosody_fbank``: gcmvn-normalized source fbank for expressive models
        (reference generator.py:306-314); ignored for non-expressive configs."""
        T = _bucket(int(text_lens.max()), 16)
        ids = jnp.asarray(text_tokens[:, :T])
        # reference generator.py:283-288 pads hypotheses then drops the FINAL
        # COLUMN before the redecode/t2u pass: the longest row(s) lose their
        # trailing EOS position, shorter rows keep theirs visible (their EOS
        # sits before the trimmed column). HF transformers reproduces the
        # same rule (sequences[:, :-1] + seq_lens from != pad). Matched here
        # exactly — cross-checked end-to-end vs hf generate in
        # tests/integration/test_hf_conversion.py.
        t2u_lens = text_lens - (text_lens == int(text_lens.max()))
        feats = self._redecode_fn()(self.params, ids, jnp.asarray(t2u_lens),
                                    enc.seqs, enc.lengths)

        if self.cfg.nar_t2u is not None:
            char_ids, char_seq_lens, char_counts = text_to_char_seqs(
                self.text_tokenizer, self.char_tokenizer,
                np.asarray(text_tokens[:, :T]),
                max_char_len=_bucket(int(text_lens.max()) * 12, 64))
            if "prosody_encoder" in self.params and prosody_fbank is None:
                # expressive models require conditioning input (reference
                # generator.py:306 asserts prosody_encoder_input is not None)
                raise ValueError(
                    "expressive model (prosody_encoder present) requires "
                    "prosody_fbank for unit generation")
            with_prosody = (prosody_fbank is not None
                            and "prosody_encoder" in self.params)
            pf = jnp.asarray(prosody_fbank) if with_prosody else \
                jnp.zeros((ids.shape[0], 1, 80), self.dtype)
            pl = jnp.asarray(prosody_lens) if with_prosody else \
                jnp.ones((ids.shape[0],), jnp.int32)
            units, unit_lens, durs = self._nar_t2u_fn(max_unit_len, with_prosody)(
                self.params, feats, jnp.asarray(t2u_lens), jnp.asarray(char_ids),
                jnp.asarray(char_counts), duration_factor, pf, pl)
            units = np.asarray(units)
            unit_lens = np.asarray(unit_lens)
            # token-space -> raw units (offset -4, EOS->pad)
            raw = self.unit_tokenizer.decode(units)
        else:
            tcfg = self.cfg.ar_t2u
            prefix = np.tile(
                np.array([[tcfg.eos_idx, self.unit_tokenizer.lang_to_index(tgt_lang)]],
                         np.int32), (text_tokens.shape[0], 1))
            res = self._ar_t2u_fn(max_unit_len, unit_opts_override)(
                self.params, feats, jnp.asarray(t2u_lens), jnp.asarray(prefix),
                jnp.full((prefix.shape[0],), 2, jnp.int32))
            units = np.asarray(res.tokens[:, 0])
            unit_lens = np.asarray(res.lengths[:, 0])
            raw = self.unit_tokenizer.decode(units)
            raw = raw[:, 1:]  # strip lang symbol (decoder keeps it at pos 0)
            # hypothesis was [eos, lang, units..., eos]: 3 non-unit tokens
            unit_lens = np.maximum(unit_lens - 3, 0)

        out_units = []
        for b in range(raw.shape[0]):
            u = [int(t) for t in raw[b, :unit_lens[b]]
                 if 0 <= t < self.unit_tokenizer.num_units]
            if ngram_filtering:
                u = remove_consecutive_repeated_ngrams(u)
            out_units.append(u)
        return out_units
