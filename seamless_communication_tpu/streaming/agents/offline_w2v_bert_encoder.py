"""Speech encoder agent: re-encodes the ENTIRE accumulated fbank prefix each chunk
with the offline conformer encoder (reference offline_w2v_bert_encoder.py:63-98 —
O(T^2) total, matches the reference's latency/quality numbers).

Fbank length is bucketed so each prefix length reuses a cached XLA program."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.unity import model as unity
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.streaming.agents.common import (
    AgentStates, GenericAgent, ReadAction, SpeechSegment, WriteAction,
)


class OfflineWav2VecBertEncoderAgent(GenericAgent):
    source_type = "speech"
    target_type = "speech"

    def __init__(self, params: dict, cfg: UnitYConfig, *,
                 min_starting_wait: Optional[int] = 192, bucket: int = 128,
                 args=None):
        self.params = params
        self.cfg = cfg
        self.min_starting_wait = min_starting_wait
        self.bucket = bucket
        self.min_input_length = 80
        self._encode = jax.jit(
            lambda p, fb, fl: unity.encode_speech(p, cfg, fb, fl))
        super().__init__(args)

    def policy(self, states: AgentStates):
        total = sum(f.shape[0] for f in states.source)
        if (self.min_starting_wait is not None and total < self.min_starting_wait
                and not states.source_finished):
            return ReadAction()
        if total < self.min_input_length:
            if states.source_finished:
                return WriteAction(SpeechSegment(content=None, is_empty=True),
                                   finished=True)
            return ReadAction()

        fbank = np.concatenate(states.source, axis=0)
        T = int(math.ceil(fbank.shape[0] / self.bucket)) * self.bucket
        padded = np.zeros((1, T, fbank.shape[1]), np.float32)
        padded[0, :fbank.shape[0]] = fbank
        enc = self._encode(self.params, jnp.asarray(padded),
                           jnp.asarray([fbank.shape[0]], jnp.int32))
        seqs = np.asarray(enc.seqs[0, :int(enc.lengths[0])])
        return WriteAction(
            SpeechSegment(content=seqs, tgt_lang=states.tgt_lang,
                          finished=states.source_finished),
            finished=states.source_finished)
