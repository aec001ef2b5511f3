"""Batched multi-session streaming: N concurrent S2T streams on ONE chip.

The reference's streaming stack (SimulEval agent pipelines,
streaming/agents/unity_pipeline.py) is strictly single-stream: one utterance
owns the whole accelerator for its session. On a TPU that wastes most of the
chip — the fused incremental chunk runs in ~70 ms of a 320 ms real-time
budget — and production serving needs many concurrent callers.

``BatchedStreamingPool`` multiplexes up to ``n_slots`` independent streaming
sessions over ONE compiled chunk program:

- the per-session chunk math is exactly ``streaming/fused.py``'s
  ``incremental_s2t_chunk`` (incremental conformer encoder + monotonic
  prefill + EMMA write burst), ``jax.vmap``-lifted over a leading session
  axis — every matmul in the chunk becomes an N-way batched matmul, so the
  MXU sees one large program instead of N serial small ones;
- all shapes are static: idle/masked slots run the same program on zero
  frames (``n_valid=0``) and their outputs are discarded on host — the
  TPU-native fixed-slot design (no recompiles as sessions come and go);
- per-session encoder-state commits are selected IN-PROGRAM by a ``commit``
  mask (the monotonic cache is rebuilt from the accumulated context every
  chunk, so an ignored decode is a perfect no-op — the same property the
  single-session agents rely on when they re-decode their prefix);
- ``source_finished`` is a traced per-session bool (the single-session jit
  specializes on it only for executable-count convenience).

Per-session policy semantics (read/write gates, min_starting_wait,
max_consecutive_writes, max_len, drain-after-EOS) replicate
``streaming/fused.py::IncrementalFusedMMASpeechToTextDecoderAgent.policy``
token-for-token — pinned by tests/integration/test_streaming_multi.py, which
asserts the pool's per-session outputs equal the single-session agent's.

Reference counterpart: none (SimulEval evaluates one stream per process;
cli/streaming/evaluate.py). This is a new TPU-first serving capability.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig,
)
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.streaming.agents.online_feature_extractor import (
    OnlineFeatureExtractorAgent,
)
from seamless_communication_tpu.streaming.fused import (
    encoder_output_length, incremental_s2t_chunk,
)

__all__ = ["BatchedStreamingPool", "PooledSegment"]


class PooledSegment:
    """One emitted chunk of a pooled session's output."""

    __slots__ = ("text", "token_indices", "finished")

    def __init__(self, text: str, token_indices: List[int], finished: bool):
        self.text = text
        self.token_indices = token_indices
        self.finished = finished

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (f"PooledSegment(text={self.text!r}, "
                f"tokens={self.token_indices}, finished={self.finished})")


class _Session:
    """Host-side state of one slot (mirrors IncrementalDecoderAgentStates +
    FeatureStates, without the SimulEval plumbing)."""

    __slots__ = ("sid", "slot", "tgt_lang", "prefix", "feat_agent",
                 "feat_states", "fbank", "fb_consumed", "n_stacked",
                 "last_decode_stacked", "target_indices", "source_finished",
                 "target_finished", "out", "active", "tick_due",
                 "pushed_since_step")

    def __init__(self, sid: int, slot: int, tgt_lang: str, prefix: List[int],
                 feat_agent: OnlineFeatureExtractorAgent):
        self.sid = sid
        self.slot = slot
        self.tgt_lang = tgt_lang
        self.prefix = prefix
        self.feat_agent = feat_agent
        self.feat_states = feat_agent.build_states()
        self.fbank: List[np.ndarray] = []     # extracted, maybe not yet encoded
        self.fb_consumed = 0                  # frames committed to enc_state
        self.n_stacked = 0                    # committed stacked frames
        self.last_decode_stacked = 0
        self.target_indices: List[int] = []
        self.source_finished = False
        self.target_finished = False
        self.out: List[PooledSegment] = []
        self.active = True
        self.tick_due = False          # feature agent WROTE since last plan
        self.pushed_since_step = False  # suppresses the drain pump this step

    @property
    def fb_len(self) -> int:
        return sum(f.shape[0] for f in self.fbank)


class BatchedStreamingPool:
    """Fixed-slot batched S2T streaming sessions sharing one compiled chunk.

    Usage::

        pool = BatchedStreamingPool(unity_params, unity_cfg, mono_params,
                                    mono_cfg, text_tokenizer, n_slots=4)
        a = pool.open_session(tgt_lang="eng")
        b = pool.open_session(tgt_lang="fra")
        pool.push(a, samples_320ms); pool.push(b, samples_320ms)
        pool.step()                  # ONE batched device chunk for all slots
        for seg in pool.pop(a): ...
    """

    def __init__(self, unity_params: dict, unity_cfg: UnitYConfig,
                 mono_params: dict, mono_cfg: MonotonicDecoderConfig,
                 text_tokenizer, *, n_slots: int = 4, fbank_block: int = 32,
                 max_stream_frames: int = 2048,
                 min_starting_wait: Optional[int] = 192,
                 min_input_length: int = 80, max_len_a: int = 1,
                 max_len_b: int = 200, max_consecutive_writes: int = 50,
                 decision_threshold: float = 0.5,
                 decision_method: str = "min", p_choose_start_layer: int = 0,
                 max_target_len: int = 512, min_gen_len: int = 0,
                 denormalize: bool = False,
                 mono_quantize_int8: Optional[bool] = None):
        from seamless_communication_tpu.streaming.pipeline import (
            _maybe_quantize_mono,
        )
        mono_params = _maybe_quantize_mono(mono_params, mono_quantize_int8)
        sp = unity_cfg.speech
        if not (sp.chunk_size and sp.left_chunk_num == -1
                and sp.conformer.causal_depthwise_conv):
            raise ValueError(
                "BatchedStreamingPool requires a chunk-causal encoder card "
                "(same exactness condition as the incremental fused agent)")
        if fbank_block % (sp.fbank_stride * sp.chunk_size) != 0:
            raise ValueError("fbank_block must cover whole attention chunks")
        self.unity_params = unity_params
        self.unity_cfg = unity_cfg
        self.mono_params = mono_params
        self.mono_cfg = mono_cfg
        self.text_tokenizer = text_tokenizer
        self.n_slots = n_slots
        self.fbank_block = fbank_block
        self.max_stream_frames = max_stream_frames
        self.min_starting_wait = min_starting_wait
        self.min_input_length = min_input_length
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.max_consecutive_writes = max_consecutive_writes
        self.decision_threshold = decision_threshold
        self.decision_method = decision_method
        self.p_choose_start_layer = p_choose_start_layer
        self.max_target_len = max_target_len
        self.min_gen_len = min_gen_len
        self.denormalize = denormalize
        self.eos_idx = text_tokenizer.vocab_info.eos_idx

        from seamless_communication_tpu.models.wav2vec2.incremental import (
            speech_encoder_stream_init,
        )
        dtype = next(l.dtype for l in jax.tree.leaves(unity_params)
                     if jnp.issubdtype(l.dtype, jnp.floating))
        one = speech_encoder_stream_init(sp, batch=1,
                                         max_frames=max_stream_frames,
                                         dtype=dtype)
        self._zero_state = one
        # (n_slots, 1, ...) stacked per-slot encoder stream states
        self.enc_state = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (n_slots,) + a.shape), one)

        self._sessions: Dict[int, _Session] = {}
        self._slot_owner: List[Optional[int]] = [None] * n_slots
        self._next_sid = 0

        def chunk(up, mp, st, fb, nv, toks, n_tok, srcfin, commit):
            (new_state, toks_o, n_written, fin, _enc_len, _ctx, _burst,
             _cache) = incremental_s2t_chunk(
                up, mp, st, fb, nv, toks, n_tok, unity_cfg, mono_cfg,
                max_target_len=max_target_len,
                decision_threshold=decision_threshold,
                decision_method=decision_method,
                p_choose_start_layer=p_choose_start_layer,
                eos_idx=self.eos_idx, max_len_a=max_len_a,
                max_len_b=max_len_b, max_writes=max_consecutive_writes,
                source_finished=srcfin, min_gen_len=min_gen_len)
            # in-program per-slot commit select: masked / commit-only slots
            # keep their previous encoder state
            sel = jax.tree.map(lambda new, old: jnp.where(commit, new, old),
                               new_state, st)
            return sel, toks_o, n_written, fin

        self._step = jax.jit(jax.vmap(
            chunk, in_axes=(None, None, 0, 0, 0, 0, 0, 0, 0)))

    # -- session lifecycle -------------------------------------------------

    def open_session(self, tgt_lang: str = "eng") -> int:
        """Claim a free slot; returns a session id."""
        try:
            slot = self._slot_owner.index(None)
        except ValueError:
            raise RuntimeError(f"all {self.n_slots} slots busy") from None
        sid = self._next_sid
        self._next_sid += 1
        prefix = [self.eos_idx, self.text_tokenizer.lang_token(tgt_lang)]
        sess = _Session(sid, slot, tgt_lang, prefix,
                        OnlineFeatureExtractorAgent(
                            denormalize=self.denormalize))
        self._sessions[sid] = sess
        self._slot_owner[slot] = sid
        # reset the slot's encoder stream state
        self.enc_state = jax.tree.map(
            lambda a, z: a.at[sess.slot].set(z), self.enc_state,
            self._zero_state)
        return sid

    def close_session(self, sid: int) -> None:
        sess = self._sessions.pop(sid)
        self._slot_owner[sess.slot] = None

    def _feat_tick(self, sess: _Session, seg) -> None:
        """One feature-extractor cycle (the pipeline's push+pop on the fbank
        agent): accumulate any written fbank, arm the decode tick iff the
        agent WROTE (a ReadAction means the downstream decoder is not polled
        this cycle — AgentPipeline.process stops at an empty unfinished
        segment, agents/common.py:141-149)."""
        from seamless_communication_tpu.streaming.agents.common import (
            Segment, WriteAction,
        )
        sess.feat_states.update_source(seg)
        action = sess.feat_agent.policy(sess.feat_states)
        if isinstance(action, WriteAction):
            sess.tick_due = True
            out = action.content
            if (isinstance(out, Segment) and not out.is_empty
                    and out.content is not None):
                fb = np.asarray(out.content, np.float32)
                if fb.ndim == 2 and fb.shape[0]:
                    sess.fbank.append(fb)

    def push(self, sid: int, samples: np.ndarray, *,
             finished: bool = False) -> None:
        """Feed a chunk of 16 kHz samples (int16-scaled floats unless the pool
        was built with denormalize=True) to one session. Call :meth:`step`
        afterwards (once per arrival interval, for ALL sessions) to run the
        batched device chunk."""
        sess = self._sessions[sid]
        if sess.source_finished:
            raise ValueError(f"session {sid} source already finished")
        # host fbank extraction with residual-sample carry (reference
        # online_feature_extractor.py semantics, shared agent implementation)
        from seamless_communication_tpu.streaming.agents.common import (
            EmptySegment, SpeechSegment,
        )
        samples = np.asarray(samples, np.float32)
        if samples.size == 0:
            seg = EmptySegment(finished=finished, tgt_lang=sess.tgt_lang)
        else:
            seg = SpeechSegment(content=list(samples), finished=finished,
                                tgt_lang=sess.tgt_lang)
        self._feat_tick(sess, seg)
        sess.source_finished = finished
        sess.pushed_since_step = True

    # -- the batched tick --------------------------------------------------

    def _plan(self, sess: _Session):
        """This tick's block queue for one session: a list of
        (fb_block, n_valid, consume_frames, commit, accept_decode) — or []
        if the slot is idle this tick.

        Token-for-token the block schedule of ONE
        IncrementalFusedMMASpeechToTextDecoderAgent.policy call: full blocks
        commit silently (decode outputs ignored — the monotonic cache is
        rebuilt from the accumulated context every chunk, so a skipped decode
        is exact), the LAST pending full block (or the padded partial / the
        post-EOS drain block) is the decode block."""
        if not sess.active or sess.target_finished or not sess.tick_due:
            return []
        total = sess.fb_len
        if (self.min_starting_wait is not None
                and total < self.min_starting_wait
                and not sess.source_finished):
            return []
        if total < self.min_input_length:
            if sess.source_finished:
                # reference gate: too little audio ever -> empty finish
                sess.target_finished = True
                sess.out.append(PooledSegment("", [], True))
            return []

        FB = self.fbank_block
        stride = self.unity_cfg.speech.fbank_stride
        pending = total - sess.fb_consumed
        n_full = pending // FB
        partial = pending - n_full * FB
        if n_full == 0 and partial == 0 and not sess.source_finished:
            return []

        flat = (np.concatenate(sess.fbank, axis=0)[sess.fb_consumed:total]
                if pending else np.zeros((0, 80), np.float32))
        blocks = []
        if partial > 0:
            for b in range(n_full):
                blocks.append((flat[b * FB:(b + 1) * FB], FB // stride, FB,
                               True, False))
            blk = np.zeros((FB, 80), np.float32)
            blk[:partial] = flat[n_full * FB:]
            commit = bool(sess.source_finished)
            blocks.append((blk, partial // stride,
                           partial if commit else 0, commit, True))
        elif n_full > 0:
            for b in range(n_full - 1):
                blocks.append((flat[b * FB:(b + 1) * FB], FB // stride, FB,
                               True, False))
            blocks.append((flat[(n_full - 1) * FB:n_full * FB], FB // stride,
                           FB, True, True))
        else:
            # drain pump after EOS: decode-only zero block
            blocks.append((np.zeros((FB, 80), np.float32), 0, 0, True, True))
        return blocks

    def step(self) -> None:
        """Process every session's pending audio to its decode point. Each
        inner iteration batches one block per session into ONE compiled
        program over all n_slots (masked slots run zero frames).

        Sessions whose source has finished but whose target has not get a
        drain pump first — an EmptySegment cycled through the feature
        extractor, exactly what the single-session pipeline does after EOS
        (StreamingSession.run's drain loop). This is deliberately
        bug-compatible with the reference: the feature agent re-extracts
        ``previous_residual_samples + source[-1]`` on EVERY post-EOS cycle
        (reference online_feature_extractor.py:106-131 keys off
        ``states.source[-1]``, which no longer advances), so each drain tick
        grows the decoder's fbank view just as the single-session agents
        see it — required for token-for-token equality."""
        from seamless_communication_tpu.streaming.agents.common import (
            EmptySegment,
        )
        for sess in self._sessions.values():
            if (sess.active and sess.source_finished
                    and not sess.target_finished
                    and not sess.pushed_since_step):
                self._feat_tick(sess, EmptySegment(finished=True,
                                                   tgt_lang=sess.tgt_lang))
            sess.pushed_since_step = False
        queues = {sid: self._plan(sess)
                  for sid, sess in self._sessions.items()}
        for sess in self._sessions.values():
            sess.tick_due = False
        while True:
            batch = {sid: q.pop(0) for sid, q in queues.items() if q}
            if not batch:
                return
            self._run_batch(batch)

    def _run_batch(self, batch: dict) -> None:
        N = self.n_slots
        fb = np.zeros((N, 1, self.fbank_block, 80), np.float32)
        nv = np.zeros((N,), np.int32)
        srcfin = np.zeros((N,), bool)
        commit = np.zeros((N,), bool)
        max_ctx = 2
        for sid, (blk, n_valid, _consume, com, _accept) in batch.items():
            sess = self._sessions[sid]
            fb[sess.slot, 0] = blk
            nv[sess.slot] = n_valid
            srcfin[sess.slot] = sess.source_finished
            commit[sess.slot] = com
            max_ctx = max(max_ctx, len(sess.prefix) + len(sess.target_indices))
        Tb = max(16, int(math.ceil(max_ctx / 16)) * 16)
        toks = np.zeros((N, 1, Tb), np.int32)
        n_tok = np.full((N,), 2, np.int32)
        for sid in batch:
            sess = self._sessions[sid]
            ctx = sess.prefix + sess.target_indices
            toks[sess.slot, 0, :len(ctx)] = ctx
            n_tok[sess.slot] = len(ctx)

        self.enc_state, out_toks, out_n, out_fin = self._step(
            self.unity_params, self.mono_params, self.enc_state,
            jnp.asarray(fb), jnp.asarray(nv), jnp.asarray(toks),
            jnp.asarray(n_tok), jnp.asarray(srcfin), jnp.asarray(commit))
        out_toks = np.asarray(out_toks)
        out_n = np.asarray(out_n)
        out_fin = np.asarray(out_fin)

        for sid, (blk, n_valid, consume, com, accept) in batch.items():
            sess = self._sessions[sid]
            # agent-policy mirror: decode_stacked = n_stacked + decode_nv
            # (equals the post-commit n_stacked for committed decode blocks)
            decode_stacked = sess.n_stacked + n_valid
            if com:
                sess.fb_consumed += consume
                sess.n_stacked += n_valid
            if not accept:
                continue
            sess.last_decode_stacked = decode_stacked
            n_written = int(out_n[sess.slot])
            pred = [int(t) for t in out_toks[sess.slot, :n_written]]
            finished = bool(out_fin[sess.slot])
            sess.target_indices += pred
            if pred or finished:
                finished = finished or (len(sess.target_indices)
                                        > self._max_len(sess))
                text = self.text_tokenizer.decode(pred)
                sess.out.append(PooledSegment(text, pred, finished))
                if finished:
                    sess.target_finished = True

    def _max_len(self, sess: _Session) -> int:
        n = sess.last_decode_stacked or sess.n_stacked
        return self.max_len_a * encoder_output_length(
            self.unity_cfg.speech,
            n * self.unity_cfg.speech.fbank_stride) + self.max_len_b

    # -- output ------------------------------------------------------------

    def pop(self, sid: int) -> List[PooledSegment]:
        """Drain this session's emitted segments."""
        sess = self._sessions[sid]
        out, sess.out = sess.out, []
        return out

    def session_tokens(self, sid: int) -> List[int]:
        return list(self._sessions[sid].target_indices)

    def session_finished(self, sid: int) -> bool:
        return self._sessions[sid].target_finished

    def session_source_finished(self, sid: int) -> bool:
        return self._sessions[sid].source_finished
