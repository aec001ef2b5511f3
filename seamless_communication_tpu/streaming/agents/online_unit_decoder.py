"""NAR unit decoder agent (reference streaming/agents/online_unit_decoder.py:23-156).

Runs the full NAR T2U over the accumulated decoder features each chunk; emits only
units whose duration index >= duration_start_index; waits until at least
``min_unit_chunk_size`` new units exist.
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.models.unity.t2u import nar_t2u_forward
from seamless_communication_tpu.models.unity.unit_tokenizer import UnitTokenizer
from seamless_communication_tpu.streaming.agents.common import (
    AgentStates, GenericAgent, ReadAction, Segment, TextSegment, WriteAction,
    host_prefetch,
)
from seamless_communication_tpu.streaming.agents.online_text_decoder import (
    UnitYTextDecoderOutput,
)
from seamless_communication_tpu.text.char_frontend import text_to_char_seqs
from seamless_communication_tpu.text.char_tokenizer import CharTokenizer
from seamless_communication_tpu.text.nllb import NllbTokenizer


class NARUnitDecoderAgentStates(AgentStates):
    def reset(self) -> None:
        self.source_token_list: List[str] = []
        self.source_indices: Optional[np.ndarray] = None
        self.duration_start_index: int = 0
        super().reset()

    def update_source(self, segment: Segment) -> None:
        self.source_finished = segment.finished
        if self.tgt_lang is None and segment.tgt_lang is not None:
            self.tgt_lang = segment.tgt_lang
        if segment.is_empty or segment.content is None:
            if segment.finished:
                self.target_finished = True
            return
        content: UnitYTextDecoderOutput = segment.content
        self.source = content.decoder_features
        self.source_indices = content.target_indices
        self.source_token_list += content.tokens


class NARUnitYUnitDecoderAgent(GenericAgent):
    source_type = "text"
    target_type = "text"

    def __init__(self, params: dict, cfg: UnitYConfig,
                 unit_tokenizer: UnitTokenizer, text_tokenizer: NllbTokenizer,
                 char_tokenizer: CharTokenizer, *, min_unit_chunk_size: int = 50,
                 d_factor: float = 1.0, max_unit_len: int = 2048,
                 text_bucket: int = 16, args=None):
        self.params = params
        self.cfg = cfg
        self.unit_tokenizer = unit_tokenizer
        self.text_tokenizer = text_tokenizer
        self.char_tokenizer = char_tokenizer
        self.min_unit_chunk_size = min_unit_chunk_size
        self.d_factor = d_factor
        self.max_unit_len = max_unit_len
        self.text_bucket = text_bucket
        def _t2u(p, feats, lens, cids, ccounts, df):
            out = nar_t2u_forward(p["t2u"], cfg.nar_t2u, feats, lens, cids,
                                  ccounts, max_unit_len=max_unit_len,
                                  duration_factor=df)
            # argmax in-program: only durations + unit ids cross the
            # device->host boundary, never the (U, vocab) logits
            return out.durations, jnp.argmax(out.unit_logits, axis=-1)

        self._t2u = jax.jit(_t2u)
        super().__init__(args)

    def build_states(self) -> NARUnitDecoderAgentStates:
        return NARUnitDecoderAgentStates()

    def policy(self, states: NARUnitDecoderAgentStates):
        if states.target_finished:
            return WriteAction(TextSegment(content=None, is_empty=True), finished=True)
        if len(states.source_token_list) < 2:
            if not states.source_finished:
                return ReadAction()
            return WriteAction(TextSegment(content=None, is_empty=True), finished=True)

        feats = np.asarray(states.source, np.float32)   # (1, T, D)
        T = feats.shape[1]
        Tb = int(math.ceil(T / self.text_bucket)) * self.text_bucket
        fpad = np.zeros((1, Tb, feats.shape[2]), np.float32)
        fpad[0, :T] = feats
        ids = np.zeros((1, Tb), np.int64)
        ids[0, :T] = states.source_indices[0, :T]

        char_ids, char_lens, char_counts = text_to_char_seqs(
            self.text_tokenizer, self.char_tokenizer, ids,
            max_char_len=max(64, Tb * 12))
        durs_dev, units_dev = self._t2u(
            self.params, jnp.asarray(fpad), jnp.asarray([T], jnp.int32),
            jnp.asarray(char_ids), jnp.asarray(char_counts), self.d_factor)
        host_prefetch(durs_dev, units_dev)
        durations = np.asarray(durs_dev[0])
        n_chars = int(char_lens[0])
        durations = durations[:n_chars]

        if states.source_finished and states.duration_start_index > 0:
            if durations[states.duration_start_index:].sum() == 0:
                return WriteAction(TextSegment(content=None, is_empty=True),
                                   finished=True)
            states.duration_start_index = max(states.duration_start_index - 1, 0)

        current_duration = int(durations[states.duration_start_index:].sum())
        if current_duration < self.min_unit_chunk_size:
            if not states.source_finished:
                return ReadAction()
            if current_duration == 0:
                return WriteAction(TextSegment(content=None, is_empty=True),
                                   finished=True)

        unit_seqs = np.asarray(units_dev[0])
        offset = int(durations[:states.duration_start_index].sum())
        total = int(durations.sum())
        unit_seqs = unit_seqs[offset:total][None]
        units = self.unit_tokenizer.decode(unit_seqs)[0]

        # minus one: an ending "," token was appended to each text chunk
        states.duration_start_index = max(n_chars - 1, 0)

        return WriteAction(
            TextSegment(content=units, finished=states.source_finished,
                        tgt_lang=states.tgt_lang),
            finished=states.source_finished)
