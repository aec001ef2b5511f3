"""Fully-fused streaming chunk: speech encoder + monotonic cache/prefill + EMMA
write burst in ONE compiled program.

The unfused pipeline (offline_w2v_bert_encoder.py + online_text_decoder.py)
issues three device calls per 320 ms chunk — encoder re-encode, cache+prefill,
write burst — plus the encoder-output transfer back to host. On remote-attached
TPUs every call and fetch pays a tunnel round-trip, which dominates chunk
latency. ``fused_s2t_chunk`` runs the whole text-decoding chunk as one program:
only the written tokens (and, for the UnitY S2ST variant, the decoder features
the NAR unit decoder consumes) cross the host boundary.

Numerics match the unfused agents exactly: encoder padding positions are
edge-filled (clamped gather of the last valid frame) before the p_choose key
pooling — identical values to the unfused agent's host-side edge fill — and the
true encoder length masks cross-attention via ``enc_padding_mask``.

Reference parity: policy semantics of streaming/agents/online_text_decoder.py
(default no_early_stop=False, block_ngrams=False configuration); pipeline shape
of streaming/agents/offline_w2v_bert_encoder.py:63-98.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig, monotonic_encode_and_prefill, monotonic_write_burst,
)
from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.models.wav2vec2.encoder import (
    SpeechEncoderConfig, adaptor_out_length,
)
from seamless_communication_tpu.streaming.agents.common import (
    ReadAction, Segment, TextSegment, WriteAction, host_prefetch,
)
from seamless_communication_tpu.streaming.agents.online_text_decoder import (
    DecoderAgentStates, MMATextDecoderAgent, UnitYMMATextDecoderAgent,
)


def encoder_output_length(cfg: SpeechEncoderConfig, n_frames: int) -> int:
    """Host-side mirror of speech_encoder_forward's length arithmetic."""
    n = n_frames // cfg.fbank_stride
    for _ in range(cfg.adaptor_layers):
        n = int(adaptor_out_length(np.asarray(n), cfg.adaptor_kernel_size,
                                   cfg.adaptor_stride))
    return n


def _decode_over_encoder(mono_params: dict, enc_seqs_raw: jax.Array,
                         enc_len: jax.Array, tokens: jax.Array,
                         n_tokens: jax.Array, mono_cfg: MonotonicDecoderConfig,
                         *, max_target_len: int, decision_threshold: float,
                         decision_method: str, p_choose_start_layer: int,
                         eos_idx: int, max_len_a: int, max_len_b: int,
                         max_writes: int, source_finished: bool,
                         min_gen_len: int = 0):
    """Monotonic cache/prefill + EMMA write burst over a (possibly padded)
    encoder output: edge-fill padding with the last valid frame (p_choose
    pooled keys have no mask), mask cross-attention with the true length."""
    S = enc_seqs_raw.shape[1]
    idx = jnp.minimum(jnp.arange(S), enc_len - 1)
    enc_seqs = jnp.take(enc_seqs_raw, idx, axis=1)
    enc_mask = (jnp.arange(S) < enc_len)[None, :]
    logits, ctx_feats, pcs, cache = monotonic_encode_and_prefill(
        mono_params, tokens, n_tokens, enc_seqs, max_target_len, mono_cfg,
        enc_padding_mask=enc_mask)
    sp_valid = jnp.maximum(1, -(-enc_len // mono_cfg.pre_decision_ratio))
    max_len = max_len_a * enc_len + max_len_b
    toks, burst_feats, n_written, finished, cache = monotonic_write_burst(
        mono_params, cache, n_tokens, logits, pcs, mono_cfg,
        decision_threshold=decision_threshold, decision_method=decision_method,
        p_choose_start_layer=p_choose_start_layer, sp_valid=sp_valid,
        eos_idx=eos_idx, max_len=max_len, n_context=n_tokens,
        max_writes=max_writes, source_finished=source_finished,
        enc_padding_mask=enc_mask, min_gen_len=min_gen_len)
    return toks, n_written, finished, ctx_feats, burst_feats, cache


def fused_s2t_chunk(unity_params: dict, mono_params: dict, fbank: jax.Array,
                    fbank_len: jax.Array, tokens: jax.Array,
                    n_tokens: jax.Array, unity_cfg: UnitYConfig,
                    mono_cfg: MonotonicDecoderConfig, *, max_target_len: int,
                    decision_threshold: float, decision_method: str,
                    p_choose_start_layer: int, eos_idx: int, max_len_a: int,
                    max_len_b: int, max_writes: int, source_finished: bool,
                    min_gen_len: int = 0):
    """Encoder re-encode + monotonic cache/prefill + EMMA write burst, fused.

    Returns (tokens (max_writes,), n_written, finished, enc_len, ctx_feats
    (B, T, D), burst_feats (max_writes, D), cache) — all device arrays; the
    caller fetches only what it needs.
    """
    enc = unity.encode_speech(unity_params, unity_cfg, fbank, fbank_len[None])
    enc_len = enc.lengths[0]
    toks, n_written, finished, ctx_feats, burst_feats, cache = \
        _decode_over_encoder(
            mono_params, enc.seqs, enc_len, tokens, n_tokens, mono_cfg,
            max_target_len=max_target_len,
            decision_threshold=decision_threshold,
            decision_method=decision_method,
            p_choose_start_layer=p_choose_start_layer, eos_idx=eos_idx,
            max_len_a=max_len_a, max_len_b=max_len_b, max_writes=max_writes,
            source_finished=source_finished, min_gen_len=min_gen_len)
    return toks, n_written, finished, enc_len, ctx_feats, burst_feats, cache


def incremental_s2t_chunk(unity_params: dict, mono_params: dict,
                          enc_state, fbank_new: jax.Array, n_valid: jax.Array,
                          tokens: jax.Array, n_tokens: jax.Array,
                          unity_cfg: UnitYConfig,
                          mono_cfg: MonotonicDecoderConfig, *,
                          max_target_len: int, decision_threshold: float,
                          decision_method: str, p_choose_start_layer: int,
                          eos_idx: int, max_len_a: int, max_len_b: int,
                          max_writes: int, source_finished: bool,
                          min_gen_len: int = 0):
    """Incremental-encoder variant of fused_s2t_chunk: encodes ONLY the new
    fbank block (models/wav2vec2/incremental.py — exact for the chunk-causal
    streaming conformer), then adaptor + prefill + write burst. All shapes are
    static across the whole stream, so ONE compiled program serves every chunk
    (no length bucketing, no mid-stream recompiles) and total conformer compute
    is O(T) instead of O(T^2)."""
    from seamless_communication_tpu.models.wav2vec2.incremental import (
        speech_encoder_stream_output, speech_encoder_stream_step,
    )
    se = unity_params["speech_encoder"]
    enc_state = speech_encoder_stream_step(se, enc_state, fbank_new,
                                           unity_cfg.speech, n_valid=n_valid)
    enc_seqs, enc_lens = speech_encoder_stream_output(se, enc_state,
                                                      unity_cfg.speech)
    enc_len = enc_lens[0]
    toks, n_written, finished, ctx_feats, burst_feats, cache = \
        _decode_over_encoder(
            mono_params, enc_seqs, enc_len, tokens, n_tokens, mono_cfg,
            max_target_len=max_target_len,
            decision_threshold=decision_threshold,
            decision_method=decision_method,
            p_choose_start_layer=p_choose_start_layer, eos_idx=eos_idx,
            max_len_a=max_len_a, max_len_b=max_len_b, max_writes=max_writes,
            source_finished=source_finished, min_gen_len=min_gen_len)
    return (enc_state, toks, n_written, finished, enc_len, ctx_feats,
            burst_feats, cache)


class FusedDecoderAgentStates(DecoderAgentStates):
    """Accumulates fbank chunks (the fused agent replaces the encoder stage, so
    its source is the feature stream, not encoder output)."""

    def update_source(self, segment: Segment) -> None:
        self.source_finished = segment.finished
        if self.tgt_lang is None and segment.tgt_lang is not None:
            self.tgt_lang = segment.tgt_lang
        if not segment.is_empty and segment.content is not None:
            self.source.append(segment.content)
            self.source_len = sum(f.shape[0] for f in self.source)
        elif segment.is_empty and segment.finished and len(self.source) == 0:
            self.target_finished = True


class FusedMMASpeechToTextDecoderAgent(MMATextDecoderAgent):
    """Encoder + EMMA text decoder in one agent: ONE device call per chunk.

    Drop-in replacement for the OfflineWav2VecBertEncoderAgent +
    MMASpeechToTextDecoderAgent pair (default policy configuration only —
    ``no_early_stop`` / ``block_ngrams`` need the unfused per-token path).
    """

    source_type = "speech"
    target_type = "text"

    def __init__(self, unity_params: dict, unity_cfg: UnitYConfig,
                 mono_params: dict, mono_cfg: MonotonicDecoderConfig,
                 text_tokenizer, *, tgt_lang: str = "eng",
                 min_starting_wait: Optional[int] = 192,
                 fbank_bucket: int = 128, min_input_length: int = 80,
                 max_len_a: int = 1, max_len_b: int = 200,
                 max_consecutive_writes: int = 50,
                 decision_threshold: float = 0.5, decision_method: str = "min",
                 p_choose_start_layer: int = 0, max_target_len: int = 512,
                 min_gen_len: int = 0, args=None):
        super().__init__(mono_params, mono_cfg, text_tokenizer,
                         tgt_lang=tgt_lang, max_len_a=max_len_a,
                         max_len_b=max_len_b,
                         max_consecutive_writes=max_consecutive_writes,
                         decision_threshold=decision_threshold,
                         decision_method=decision_method,
                         p_choose_start_layer=p_choose_start_layer,
                         max_target_len=max_target_len, args=args)
        self.unity_params = unity_params
        self.unity_cfg = unity_cfg
        self.min_starting_wait = min_starting_wait
        self.fbank_bucket = fbank_bucket
        self.min_input_length = min_input_length
        self.min_gen_len = min_gen_len
        self._fused = jax.jit(
            lambda up, mp, fb, fl, toks, n, srcfin: fused_s2t_chunk(
                up, mp, fb, fl, toks, n, unity_cfg, mono_cfg,
                max_target_len=self.max_target_len,
                decision_threshold=self.decision_threshold,
                decision_method=self.decision_method,
                p_choose_start_layer=self.p_choose_start_layer,
                eos_idx=self.eos_idx, max_len_a=self.max_len_a,
                max_len_b=self.max_len_b,
                max_writes=self.max_consecutive_writes,
                source_finished=srcfin, min_gen_len=self.min_gen_len),
            static_argnames=("srcfin",))

    def build_states(self) -> FusedDecoderAgentStates:
        return FusedDecoderAgentStates()

    def max_len(self, states: FusedDecoderAgentStates) -> int:
        # source_len counts fbank frames here; convert to encoder frames to
        # match the unfused agent's max-length semantics
        return (self.max_len_a
                * encoder_output_length(self.unity_cfg.speech, states.source_len)
                + self.max_len_b)

    def policy(self, states: FusedDecoderAgentStates):
        total = sum(f.shape[0] for f in states.source)
        if (self.min_starting_wait is not None and total < self.min_starting_wait
                and not states.source_finished):
            return ReadAction()
        if total < self.min_input_length:
            if states.source_finished or states.target_finished:
                return WriteAction(TextSegment(content=None, is_empty=True),
                                   finished=True)
            return ReadAction()
        if states.target_finished:
            return WriteAction(TextSegment(content=None, is_empty=True),
                               finished=True)

        self._enforce_tgt_lang(states)
        fbank = np.concatenate(states.source, axis=0)
        T = int(math.ceil(fbank.shape[0] / self.fbank_bucket)) * self.fbank_bucket
        fb = np.zeros((1, T, fbank.shape[1]), np.float32)
        fb[0, :fbank.shape[0]] = fbank
        # host mirrors of the in-program encoder lengths (for _prob and the
        # UnitY "," smoothing step's cross-attention mask)
        S_static = encoder_output_length(self.unity_cfg.speech, T)
        self._enc_valid = encoder_output_length(self.unity_cfg.speech,
                                                fbank.shape[0])
        self._enc_mask = jnp.asarray(
            (np.arange(S_static) < self._enc_valid)[None, :])

        context = self.prefix_indices + states.target_indices
        Tb = max(16, int(math.ceil(len(context) / 16)) * 16)
        ctx = np.zeros((1, Tb), np.int32)
        ctx[0, :len(context)] = context

        toks, n_written, fin, enc_len, ctx_feats, burst_feats, cache = \
            self._fused(self.unity_params, self.params, jnp.asarray(fb),
                        jnp.asarray(fbank.shape[0], jnp.int32),
                        jnp.asarray(ctx), jnp.asarray(len(context), jnp.int32),
                        bool(states.source_finished))
        host_prefetch(toks, n_written, fin,
                      *((ctx_feats, burst_feats) if self.needs_features else ()))
        n_written = int(n_written)
        pred_indices = [int(t) for t in np.asarray(toks)[:n_written]]
        finished = bool(fin)
        step = len(context) + n_written
        states.target_indices += pred_indices
        if len(pred_indices) > 0 or finished:
            feats: List[np.ndarray] = []
            if self.needs_features:
                feats.append(np.asarray(ctx_feats[0, :len(context)]))
                if n_written:
                    # ONE transfer for the whole burst (per-token fetches are
                    # per-RPC through the remote device tunnel)
                    bf = np.asarray(burst_feats)[:n_written]
                    feats.extend(bf[i][None] for i in range(n_written))
            finished = finished or (len(states.target_indices)
                                    > self.max_len(states))
            return WriteAction(
                self.postprocess(states, pred_indices, finished, feats, cache,
                                 step),
                finished=finished)
        return ReadAction()


class FusedUnitYMMATextDecoderAgent(FusedMMASpeechToTextDecoderAgent,
                                    UnitYMMATextDecoderAgent):
    """Fused variant feeding the NAR unit decoder: the fused policy from
    FusedMMASpeechToTextDecoderAgent + the feature-emitting postprocess (with
    the "," smoothing step) from UnitYMMATextDecoderAgent."""


class IncrementalDecoderAgentStates(FusedDecoderAgentStates):
    def reset(self) -> None:
        self.enc_state = None      # SpeechEncoderStreamState (device arrays)
        self.fb_consumed = 0       # fbank frames already fed to the encoder
        self.n_stacked = 0         # stacked frames encoded (host mirror)
        super().reset()


class IncrementalFusedMMASpeechToTextDecoderAgent(FusedMMASpeechToTextDecoderAgent):
    """Incremental-encoder fused agent: per chunk, encode ONLY the new fbank
    block (exact for the chunk-causal streaming conformer) and run the decode
    in the same compiled program. Static shapes end-to-end: one executable per
    (context-bucket, srcfin) for the WHOLE stream — no length-bucket recompiles
    — and total conformer compute drops from O(T^2) to O(T).

    ``max_stream_frames`` bounds the stream length in STACKED frames
    (fbank/2); 2048 = ~41 s of audio.
    """

    def __init__(self, unity_params: dict, unity_cfg: UnitYConfig,
                 mono_params: dict, mono_cfg: MonotonicDecoderConfig,
                 text_tokenizer, *, fbank_block: int = 32,
                 max_stream_frames: int = 2048, **kw):
        super().__init__(unity_params, unity_cfg, mono_params, mono_cfg,
                         text_tokenizer, **kw)
        from seamless_communication_tpu.models.wav2vec2.incremental import (
            speech_encoder_stream_step,
        )
        sp = unity_cfg.speech
        if not (sp.chunk_size and sp.left_chunk_num == -1
                and sp.conformer.causal_depthwise_conv):
            raise ValueError(
                "incremental encoding is exact only for chunk-causal encoders "
                "(chunk_size set, full left context, causal depthwise conv) — "
                "use the non-incremental fused agent for this card")
        self.fbank_block = fbank_block
        self.max_stream_frames = max_stream_frames
        self._stacked_block = fbank_block // unity_cfg.speech.fbank_stride
        if unity_cfg.speech.chunk_size:
            assert self._stacked_block % unity_cfg.speech.chunk_size == 0, \
                "fbank_block must cover whole attention chunks"
        self._enc_step = jax.jit(
            lambda up, st, fb, nv: speech_encoder_stream_step(
                up["speech_encoder"], st, fb, unity_cfg.speech, n_valid=nv))
        self._fused_inc = jax.jit(
            lambda up, mp, st, fb, nv, toks, n, srcfin: incremental_s2t_chunk(
                up, mp, st, fb, nv, toks, n, unity_cfg, mono_cfg,
                max_target_len=self.max_target_len,
                decision_threshold=self.decision_threshold,
                decision_method=self.decision_method,
                p_choose_start_layer=self.p_choose_start_layer,
                eos_idx=self.eos_idx, max_len_a=self.max_len_a,
                max_len_b=self.max_len_b, max_writes=self.max_consecutive_writes,
                source_finished=srcfin, min_gen_len=self.min_gen_len),
            static_argnames=("srcfin",))

    def build_states(self) -> IncrementalDecoderAgentStates:
        return IncrementalDecoderAgentStates()

    def _adaptor_len(self, n_stacked: int) -> int:
        return encoder_output_length(
            self.unity_cfg.speech,
            n_stacked * self.unity_cfg.speech.fbank_stride)

    def max_len(self, states) -> int:
        n = getattr(self, "_last_decode_stacked", 0) or states.n_stacked
        return self.max_len_a * self._adaptor_len(n) + self.max_len_b

    def policy(self, states: IncrementalDecoderAgentStates):
        from seamless_communication_tpu.models.wav2vec2.incremental import (
            speech_encoder_stream_init,
        )
        total = sum(f.shape[0] for f in states.source)
        if (self.min_starting_wait is not None and total < self.min_starting_wait
                and not states.source_finished):
            return ReadAction()
        if total < self.min_input_length:
            if states.source_finished or states.target_finished:
                return WriteAction(TextSegment(content=None, is_empty=True),
                                   finished=True)
            return ReadAction()
        if states.target_finished:
            return WriteAction(TextSegment(content=None, is_empty=True),
                               finished=True)

        self._enforce_tgt_lang(states)
        if states.enc_state is None:
            # first FLOATING leaf: int8-quantized trees carry int8/f32-scale
            # leaves whose dtype must not leak into the encoder KV state
            dtype = next(l.dtype
                         for l in jax.tree.leaves(self.unity_params)
                         if jnp.issubdtype(l.dtype, jnp.floating))
            states.enc_state = speech_encoder_stream_init(
                self.unity_cfg.speech, batch=1,
                max_frames=self.max_stream_frames, dtype=dtype)

        FB = self.fbank_block
        stride = self.unity_cfg.speech.fbank_stride
        new = total - states.fb_consumed
        n_full = new // FB
        partial = new - n_full * FB
        if n_full == 0 and partial == 0 and not states.source_finished:
            return ReadAction()

        fbank = np.concatenate(states.source, axis=0)[states.fb_consumed:total]

        # full blocks commit to the stream state; the decode block is either
        # the LAST full block (committed) or the pending partial chunk padded
        # to FB (UNCOMMITTED — its outputs are not final yet, but the offline
        # agent decodes over them, so the incremental agent must too)
        commit_blocks = [fbank[b * FB:(b + 1) * FB] for b in range(n_full)]
        if partial > 0:
            decode_fb = np.zeros((FB, fbank.shape[1]), np.float32)
            decode_fb[:partial] = fbank[n_full * FB:]
            decode_nv = partial // stride
            commit_decode = bool(states.source_finished)
        elif n_full > 0:
            decode_fb, decode_nv, commit_decode = commit_blocks.pop(), FB // stride, True
        else:   # drain pump after the source ended: decode-only
            decode_fb = np.zeros((FB, 80), np.float32)
            decode_nv, commit_decode = 0, True

        context = self.prefix_indices + states.target_indices
        Tb = max(16, int(math.ceil(len(context) / 16)) * 16)
        ctx = np.zeros((1, Tb), np.int32)
        ctx[0, :len(context)] = context

        for fb_np in commit_blocks:
            states.enc_state = self._enc_step(
                self.unity_params, states.enc_state,
                jnp.asarray(fb_np[None], jnp.float32),
                jnp.asarray(FB // stride, jnp.int32))
            states.n_stacked += FB // stride
            states.fb_consumed += FB
        (new_enc_state, toks, n_written, fin, enc_len, ctx_feats,
         burst_feats, cache) = self._fused_inc(
            self.unity_params, self.params, states.enc_state,
            jnp.asarray(decode_fb[None], jnp.float32),
            jnp.asarray(decode_nv, jnp.int32),
            jnp.asarray(ctx), jnp.asarray(len(context), jnp.int32),
            bool(states.source_finished))
        host_prefetch(toks, n_written, fin,
                      *((ctx_feats, burst_feats) if self.needs_features else ()))
        decode_stacked = states.n_stacked + decode_nv
        if commit_decode:
            states.enc_state = new_enc_state
            states.n_stacked = decode_stacked
            states.fb_consumed = total

        # host mirrors for _prob and the UnitY "," step
        S_static = encoder_output_length(
            self.unity_cfg.speech,
            self.max_stream_frames * self.unity_cfg.speech.fbank_stride)
        self._enc_valid = self._adaptor_len(decode_stacked)
        self._enc_mask = jnp.asarray(
            (np.arange(S_static) < self._enc_valid)[None, :])
        self._last_decode_stacked = decode_stacked

        n_written = int(n_written)
        pred_indices = [int(t) for t in np.asarray(toks)[:n_written]]
        finished = bool(fin)
        step = len(context) + n_written
        states.target_indices += pred_indices
        if len(pred_indices) > 0 or finished:
            feats: List[np.ndarray] = []
            if self.needs_features:
                feats.append(np.asarray(ctx_feats[0, :len(context)]))
                if n_written:
                    # ONE transfer for the whole burst (per-token fetches are
                    # per-RPC through the remote device tunnel)
                    bf = np.asarray(burst_feats)[:n_written]
                    feats.extend(bf[i][None] for i in range(n_written))
            finished = finished or (len(states.target_indices)
                                    > self.max_len(states))
            return WriteAction(
                self.postprocess(states, pred_indices, finished, feats, cache,
                                 step),
                finished=finished)
        return ReadAction()


class IncrementalFusedUnitYMMATextDecoderAgent(
        IncrementalFusedMMASpeechToTextDecoderAgent, UnitYMMATextDecoderAgent):
    """Incremental fused variant feeding the NAR unit decoder."""
