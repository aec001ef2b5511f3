"""EMMA monotonic text decoder agents
(reference streaming/agents/online_text_decoder.py:26-444).

Policy per 320 ms chunk: greedily decode step-by-step over the (re-encoded) source
prefix; WRITE a token iff the p_choose statistic (min/mean/median over heads and
layers >= p_choose_start_layer, at the last source position) clears
``decision_threshold`` or the source is finished; stop on EOS / max-len /
max_consecutive_writes; optional n-gram blocking forces a READ.

Each policy call rebuilds the KV cache (fresh state bag, reference
online_text_decoder.py:317) because the encoder output grew; per-step decode is one
compiled program with the encoder length bucketed.
"""

from __future__ import annotations

import math
from typing import List, Optional, Set

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.monotonic.model import (
    MonotonicDecoderConfig, monotonic_decode_step, monotonic_decoder_cache,
    monotonic_encode_and_prefill, monotonic_write_burst,
)
from seamless_communication_tpu.streaming.agents.common import (
    AgentStates, GenericAgent, ReadAction, Segment, TextSegment, WriteAction,
    host_prefetch,
)
from seamless_communication_tpu.text.nllb import NllbTokenizer


class DecoderAgentStates(AgentStates):
    def reset(self) -> None:
        self.source_len = 0
        self.target_indices: List[int] = []
        self.ngram_block_count = 0
        super().reset()

    def update_source(self, segment: Segment) -> None:
        self.source_finished = segment.finished
        if self.tgt_lang is None and segment.tgt_lang is not None:
            self.tgt_lang = segment.tgt_lang
        if not segment.is_empty and segment.content is not None:
            self.source = segment.content          # replace: full re-encoded prefix
            if len(self.source) == 0 and segment.finished:
                self.target_finished = True
                return
            self.source_len = self.source.shape[0]
        elif segment.is_empty and segment.finished and len(self.source) == 0:
            self.target_finished = True


class UnitYTextDecoderOutput:
    def __init__(self, decoder_features: np.ndarray, tokens: List[str],
                 target_indices: Optional[np.ndarray] = None):
        self.decoder_features = decoder_features
        self.tokens = tokens
        self.target_indices = target_indices


class MMATextDecoderAgent(GenericAgent):
    source_type = "speech"
    target_type = "text"
    # base agent's postprocess ignores decoder features — skip fetching them
    # from device (saves (T, D) fp32 transfers per chunk through the tunnel)
    needs_features = False

    def __init__(self, params: dict, cfg: MonotonicDecoderConfig,
                 text_tokenizer: NllbTokenizer, *, tgt_lang: str = "eng",
                 max_len_a: int = 1, max_len_b: int = 200,
                 max_consecutive_writes: int = 50, min_starting_wait: int = 1,
                 no_early_stop: bool = False, decision_threshold: float = 0.5,
                 decision_method: str = "min", p_choose_start_layer: int = 0,
                 block_ngrams: bool = False, enc_bucket: int = 64,
                 max_target_len: int = 512, args=None):
        self.params = params
        self.cfg = cfg
        self.text_tokenizer = text_tokenizer
        self.max_len_a = max_len_a
        self.max_len_b = max_len_b
        self.max_consecutive_writes = max_consecutive_writes
        self.min_starting_wait = min_starting_wait
        self.no_early_stop = no_early_stop
        self.decision_threshold = decision_threshold
        self.decision_method = decision_method
        self.p_choose_start_layer = p_choose_start_layer
        self.block_ngrams = block_ngrams
        self.enc_bucket = enc_bucket
        self.max_target_len = max_target_len
        self.eos_idx = text_tokenizer.vocab_info.eos_idx
        self.prefix_indices = [self.eos_idx, text_tokenizer.lang_token(tgt_lang)]
        self._step = jax.jit(
            lambda p, tok, cache, step, mask: monotonic_decode_step(
                p, tok, cache, step, cfg, enc_padding_mask=mask))
        # one compiled program builds the cache AND decodes the whole re-decoded
        # context (per-token host dispatch dominates chunk latency otherwise)
        self._prefill = jax.jit(
            lambda p, toks, n, enc, mask: monotonic_encode_and_prefill(
                p, toks, n, enc, self.max_target_len, cfg,
                enc_padding_mask=mask))
        # device-side write loop (default policy config): one program per chunk
        self._burst = jax.jit(
            lambda p, cache, step, logits, pcs, spv, maxlen, nctx, srcfin, mask:
            monotonic_write_burst(
                p, cache, step, logits, pcs, cfg,
                decision_threshold=self.decision_threshold,
                decision_method=self.decision_method,
                p_choose_start_layer=self.p_choose_start_layer,
                sp_valid=spv, eos_idx=self.eos_idx, max_len=maxlen,
                n_context=nctx, max_writes=self.max_consecutive_writes,
                source_finished=srcfin, enc_padding_mask=mask),
            static_argnames=("srcfin",))
        super().__init__(args)

    def build_states(self) -> DecoderAgentStates:
        return DecoderAgentStates()

    def max_len(self, states: DecoderAgentStates) -> int:
        return self.max_len_a * states.source_len + self.max_len_b

    # ------------------------------------------------------------------

    def _pad_encoder_output(self, enc: np.ndarray) -> np.ndarray:
        S = int(math.ceil(enc.shape[0] / self.enc_bucket)) * self.enc_bucket
        padded = np.zeros((1, S, enc.shape[1]), np.float32)
        padded[0, :enc.shape[0]] = enc
        self._enc_valid = enc.shape[0]
        # pooled p_choose keys have no mask — pad with edge values; cross
        # attention IS masked with the true length (matches the fused path)
        padded[0, enc.shape[0]:] = enc[-1]
        self._enc_mask = jnp.asarray((np.arange(S) < enc.shape[0])[None, :])
        return padded

    def _prob(self, pchoose: np.ndarray) -> float:
        H = self.cfg.num_heads
        Sp_valid = max(1, -(-self._enc_valid // self.cfg.pre_decision_ratio))
        pl = pchoose.reshape(self.cfg.num_layers, H, -1)[
            self.p_choose_start_layer:, :, Sp_valid - 1]
        if self.decision_method == "min":
            return float(pl.min())
        if self.decision_method == "mean":
            return float(pl.mean())
        return float(np.median(pl))

    def _enforce_tgt_lang(self, states: DecoderAgentStates) -> None:
        if states.tgt_lang:
            self.prefix_indices[-1] = self.text_tokenizer.lang_token(states.tgt_lang)

    def _get_blocked_ngrams(self, target_indices: List[int]) -> Optional[Set[str]]:
        if not self.block_ngrams:
            return None
        blocked = set()
        if len(target_indices) >= 4:
            blocked |= {str(target_indices[-4:]), str(target_indices[-4:-2]),
                        str(target_indices[-4:-1])}
        if len(target_indices) >= 3:
            blocked |= {str(target_indices[-3:]), str(target_indices[-3:-1])}
        if len(target_indices) >= 2:
            blocked.add(str(target_indices[-2:]))
        return blocked

    def policy(self, states: DecoderAgentStates):
        if len(states.source) == 0:
            return ReadAction()
        if states.source_len < self.min_starting_wait and not states.source_finished:
            return ReadAction()
        if states.target_finished:
            return WriteAction(TextSegment(content=None, is_empty=True),
                               finished=True)

        self._enforce_tgt_lang(states)
        enc_padded = self._pad_encoder_output(np.asarray(states.source, np.float32))

        context = self.prefix_indices + states.target_indices
        pred_indices: List[int] = []
        finished = False
        blocked_ngrams = self._get_blocked_ngrams(states.target_indices)
        feats: List[np.ndarray] = []

        # decode the full context in ONE compiled program (fresh cache each chunk,
        # reference semantics), then extend token-by-token
        Tb = max(16, int(math.ceil(len(context) / 16)) * 16)
        ctx = np.zeros((1, Tb), np.int32)
        ctx[0, :len(context)] = context
        logits, ctx_feats, pchoose, cache = self._prefill(
            self.params, jnp.asarray(ctx), jnp.asarray(len(context), jnp.int32),
            jnp.asarray(enc_padded), self._enc_mask)
        step = len(context)

        # fast path: whole write loop on device (one program per chunk)
        if not self.no_early_stop and blocked_ngrams is None:
            sp_valid = max(1, -(-self._enc_valid // self.cfg.pre_decision_ratio))
            # dispatch the burst BEFORE fetching any prefill output: jax dispatch
            # is async, so the burst overlaps with the prefill result round-trip
            # (matters through a high-RTT remote device tunnel)
            toks, burst_feats, n_written, fin, cache = self._burst(
                self.params, cache, jnp.asarray(step, jnp.int32), logits, pchoose,
                jnp.asarray(sp_valid, jnp.int32),
                jnp.asarray(self.max_len(states), jnp.int32),
                jnp.asarray(len(context), jnp.int32),
                bool(states.source_finished), self._enc_mask)
            host_prefetch(toks, n_written, fin,
                          *((ctx_feats, burst_feats)
                            if self.needs_features else ()))
            n_written = int(n_written)
            pred_indices = [int(t) for t in np.asarray(toks)[:n_written]]
            finished = bool(fin)
            step += n_written
            states.target_indices += pred_indices
            if len(pred_indices) > 0 or finished:
                if self.needs_features:
                    feats.append(np.asarray(ctx_feats[0, :len(context)]))
                    if n_written:
                        # ONE device->host transfer for the whole burst: a
                        # per-token fetch is a separate RPC through the remote
                        # device tunnel (~10 ms each — it dominated the S2ST
                        # streaming chunk before batching)
                        bf = np.asarray(burst_feats)[:n_written]
                        feats.extend(bf[i][None] for i in range(n_written))
                finished = finished or (len(states.target_indices)
                                        > self.max_len(states))
                states.ngram_block_count = 0
                return WriteAction(
                    self.postprocess(states, pred_indices, finished, feats, cache,
                                     step),
                    finished=finished)
            return ReadAction()

        if self.needs_features:
            feats.append(np.asarray(ctx_feats[0, :len(context)]))
        while True:
            index = int(np.argmax(np.asarray(logits[0])))
            prob = self._prob(np.asarray(pchoose[0]))

            if (self.no_early_stop and not states.source_finished
                    and (prob < self.decision_threshold or index == self.eos_idx)):
                if prob == 1.0:
                    pred_indices = []
                break
            # n-gram blocking: force READ on repeat (reference :283-300)
            if blocked_ngrams is not None and not states.source_finished:
                all_idx = states.target_indices + pred_indices + [index]
                hit = False
                for n in (3, 2):
                    if len(all_idx) >= n and states.ngram_block_count <= 4:
                        if str(all_idx[-n:]) in blocked_ngrams:
                            states.ngram_block_count += 1
                            pred_indices = pred_indices[:-(n - 1)] if n > 1 else pred_indices
                            # feats[0] holds the whole context block; one entry per
                            # prediction follows
                            feats = feats[:1 + len(pred_indices)]
                            hit = True
                            break
                        blocked_ngrams.add(str(all_idx[-n:]))
                if hit:
                    break
            cur_len = len(states.target_indices) + len(pred_indices)
            if (index == self.eos_idx or cur_len > self.max_len(states)
                    # at the exact boundary with a finished source, stop here —
                    # breaking without a prediction would livelock the drain loop
                    or (states.source_finished and cur_len >= self.max_len(states))):
                finished = True
                break
            if prob < self.decision_threshold and not states.source_finished:
                break
            if (len(states.target_indices + pred_indices) >= self.max_len(states)
                    or len(pred_indices) >= self.max_consecutive_writes
                    or step >= self.max_target_len - 1):
                break

            pred_indices.append(index)
            logits, feat, pchoose, cache = self._step(
                self.params, jnp.asarray([[index]], jnp.int32), cache,
                jnp.asarray(step, jnp.int32), self._enc_mask)
            if self.needs_features:
                feats.append(np.asarray(feat[0]))
            step += 1

        states.target_indices += pred_indices

        if len(pred_indices) > 0 or finished:
            finished = finished or (len(states.target_indices)
                                    > self.max_len(states))
            states.ngram_block_count = 0
            return WriteAction(
                self.postprocess(states, pred_indices, finished, feats, cache, step),
                finished=finished)
        return ReadAction()

    def postprocess(self, states: DecoderAgentStates, pred_indices: List[int],
                    finished: bool, feats: List[np.ndarray], cache, step: int
                    ) -> TextSegment:
        text = self.text_tokenizer.decode(pred_indices)
        return TextSegment(content=text, finished=finished, tgt_lang=states.tgt_lang)


class MMASpeechToTextDecoderAgent(MMATextDecoderAgent):
    source_type = "speech"


class UnitYMMATextDecoderAgent(MMASpeechToTextDecoderAgent):
    """Variant feeding the downstream NAR unit decoder: emits the full decoder
    features and target token ids; appends a "," token for smooth speech
    (reference online_text_decoder.py:401-444)."""

    needs_features = True

    def postprocess(self, states: DecoderAgentStates, pred_indices: List[int],
                    finished: bool, feats: List[np.ndarray], cache, step: int
                    ) -> TextSegment:
        tokens = [self.text_tokenizer.id_to_token(i) for i in pred_indices]
        token_list = self.prefix_indices + states.target_indices
        if len(pred_indices) > 0 and pred_indices[-1] != self.eos_idx:
            comma = self.text_tokenizer.token_to_id(",")
            token_list = token_list + [comma]
            _, feat, _, cache = self._step(
                self.params, jnp.asarray([[comma]], jnp.int32), cache,
                jnp.asarray(step, jnp.int32), self._enc_mask)
            feats = feats + [np.asarray(feat[0])]
        features = np.concatenate(feats, axis=0)[None]   # (1, T, D)
        target_input = np.asarray([token_list], np.int64)
        return TextSegment(
            content=UnitYTextDecoderOutput(features, tokens, target_input),
            finished=finished, tgt_lang=states.tgt_lang)
