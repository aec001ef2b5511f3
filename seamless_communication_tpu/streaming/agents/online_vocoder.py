"""Vocoder agent: unit chunk -> waveform chunk, no duration prediction
(reference streaming/agents/online_vocoder.py:27-89)."""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.vocoder.codehifigan import (
    CodeHifiGanConfig, code_hifigan_forward,
)
from seamless_communication_tpu.streaming.agents.common import (
    AgentStates, GenericAgent, ReadAction, SpeechSegment, WriteAction,
    host_prefetch,
)


class VocoderAgent(GenericAgent):
    source_type = "text"
    target_type = "speech"

    def __init__(self, params: dict, cfg: CodeHifiGanConfig, *,
                 lang_spkr_idx_map: dict, tgt_lang: str = "eng", spkr: int = -1,
                 sample_rate: int = 16000, unit_bucket: int = 32, args=None):
        self.params = params
        self.cfg = cfg
        self.lang_spkr_idx_map = lang_spkr_idx_map
        self.default_tgt_lang = tgt_lang
        self.spkr = spkr
        self.sample_rate = sample_rate
        self.unit_bucket = unit_bucket
        self._voc = jax.jit(
            lambda p, u, ul, l, s: code_hifigan_forward(
                p, cfg, u, ul, l, s, dur_prediction=False))
        super().__init__(args)

    def policy(self, states: AgentStates):
        if len(states.source) == 0:
            if states.source_finished:
                return WriteAction(SpeechSegment(content=np.zeros(0, np.float32),
                                                 is_empty=True), finished=True)
            return ReadAction()

        units = np.asarray(states.source[-1]).reshape(-1)
        units = units[(units >= 0) & (units < self.cfg.num_units)]
        states.source = []
        if units.size == 0:
            if states.source_finished:
                return WriteAction(SpeechSegment(content=np.zeros(0, np.float32),
                                                 is_empty=True), finished=True)
            return ReadAction()

        tgt_lang = states.tgt_lang or self.default_tgt_lang
        lang_id = self.lang_spkr_idx_map.get("multilingual", {}).get(tgt_lang, 0)
        spkrs = self.lang_spkr_idx_map.get("multispkr", {}).get(tgt_lang, [0])
        spkr_id = spkrs[self.spkr] if 0 <= self.spkr < len(spkrs) else spkrs[-1]

        U = int(math.ceil(units.size / self.unit_bucket)) * self.unit_bucket
        arr = np.zeros((1, U), np.int32)
        arr[0, :units.size] = units
        out = self._voc(self.params, jnp.asarray(arr),
                        jnp.asarray([units.size], jnp.int32),
                        jnp.asarray([lang_id]), jnp.asarray([spkr_id]))
        host_prefetch(out.waveform, out.sample_lengths)
        wav = np.asarray(out.waveform)[0, :int(np.asarray(out.sample_lengths)[0])]
        return WriteAction(
            SpeechSegment(content=wav, sample_rate=self.sample_rate,
                          tgt_lang=tgt_lang, finished=states.source_finished),
            finished=states.source_finished)
