"""Expressive streaming vocoder agents
(reference streaming/agents/pretssel_vocoder.py:35-168, dual_vocoder_agent.py:62-169).

PretsselVocoderAgent: unit chunk -> dedup consecutive (+4 control offset),
durations x2, gcmvn-normalized fbank of the ACCUMULATED upstream source audio as
prosody input -> PRETSSEL waveform chunk.

DualVocoderAgent: switches between the standard code-HiFi-GAN agent and the
expressive PRETSSEL agent per utterance (expressive flag / language support).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.audio.fbank import fbank_numpy
from seamless_communication_tpu.inference.pretssel_generator import unique_consecutive
from seamless_communication_tpu.models.pretssel.vocoder import (
    PretsselConfig, pretssel_forward,
)
from seamless_communication_tpu.streaming.agents.common import (
    AgentStates, GenericAgent, ReadAction, SpeechSegment, WriteAction,
    host_prefetch,
)
from seamless_communication_tpu.streaming.agents.online_vocoder import VocoderAgent


class PretsselVocoderAgent(GenericAgent):
    source_type = "text"
    target_type = "speech"

    def __init__(self, params: dict, cfg: PretsselConfig, *, lang_to_index: dict,
                 gcmvn_mean: np.ndarray, gcmvn_std: np.ndarray,
                 tgt_lang: str = "eng", sample_rate: int = 16000,
                 upstream_audio_getter=None, args=None):
        self.params = params
        self.cfg = cfg
        self.lang_to_index = lang_to_index
        self.gcmvn_mean = np.asarray(gcmvn_mean, np.float32)
        self.gcmvn_std = np.asarray(gcmvn_std, np.float32)
        self.default_tgt_lang = tgt_lang
        self.sample_rate = sample_rate
        # callable returning the accumulated source waveform (the reference reads
        # upstream_states[idx].source, pretssel_vocoder.py:99-104)
        self.upstream_audio_getter = upstream_audio_getter or (lambda: [])
        self._fn = jax.jit(
            lambda p, u, ul, d, pf, pl, lid, M: pretssel_forward(
                p, cfg, u, ul, d, pf, pl, lid, max_mel_len=M),
            static_argnames=("M",))
        super().__init__(args)

    def policy(self, states: AgentStates):
        if len(states.source) == 0:
            if states.source_finished:
                return WriteAction(SpeechSegment(content=np.zeros(0, np.float32),
                                                 is_empty=True), finished=True)
            return ReadAction()

        units = np.asarray(states.source[-1]).reshape(-1).tolist()
        states.source = []
        tgt_lang = states.tgt_lang or self.default_tgt_lang
        if not units or tgt_lang not in self.lang_to_index:
            return WriteAction(SpeechSegment(content=np.zeros(0, np.float32),
                                             is_empty=not units,
                                             tgt_lang=tgt_lang),
                               finished=states.source_finished)

        uniq, durs = unique_consecutive(units)
        toks = [u + 4 for u in uniq]
        durs = [d * 2 for d in durs]

        source = np.asarray(self.upstream_audio_getter(), np.float32).reshape(-1)
        if source.size < 400:
            source = np.pad(source, (0, 400 - source.size))
        feats = fbank_numpy(source)
        feats = ((feats - self.gcmvn_mean[None]) / self.gcmvn_std[None]).astype(
            np.float32)

        U = max(8, -(-len(toks) // 8) * 8)
        u_arr = np.ones((1, U), np.int32)
        d_arr = np.zeros((1, U), np.int32)
        u_arr[0, :len(toks)] = toks
        d_arr[0, :len(durs)] = durs
        M = max(64, -(-sum(durs) // 64) * 64)
        Tb = max(128, -(-feats.shape[0] // 128) * 128)
        fpad = np.zeros((1, Tb, feats.shape[1]), np.float32)
        fpad[0, :feats.shape[0]] = feats
        out = self._fn(self.params, jnp.asarray(u_arr),
                       jnp.asarray([len(toks)], jnp.int32), jnp.asarray(d_arr),
                       jnp.asarray(fpad), jnp.asarray([feats.shape[0]], jnp.int32),
                       jnp.asarray([self.lang_to_index[tgt_lang]]), M)
        host_prefetch(out.waveform, out.sample_lengths)
        wav = np.asarray(out.waveform)[0, :int(np.asarray(out.sample_lengths)[0])]
        return WriteAction(
            SpeechSegment(content=wav, sample_rate=self.sample_rate,
                          tgt_lang=tgt_lang, finished=states.source_finished),
            finished=states.source_finished)


class DualVocoderAgent(GenericAgent):
    """Per-utterance switch between standard and expressive vocoders
    (reference dual_vocoder_agent.py:62-169)."""

    source_type = "text"
    target_type = "speech"

    def __init__(self, vocoder_agent: VocoderAgent,
                 pretssel_agent: PretsselVocoderAgent, *,
                 expressive: bool = True, args=None):
        self.vocoder_agent = vocoder_agent
        self.pretssel_agent = pretssel_agent
        self.expressive = expressive
        super().__init__(args)

    def reset(self):
        super().reset()
        self.vocoder_agent.reset()
        self.pretssel_agent.reset()

    def _active(self, tgt_lang: Optional[str]) -> GenericAgent:
        if (self.expressive and tgt_lang
                and tgt_lang in self.pretssel_agent.lang_to_index):
            return self.pretssel_agent
        return self.vocoder_agent

    def push(self, segment):
        super().push(segment)
        self._active(self.states.tgt_lang).push(segment)

    def policy(self, states: AgentStates):
        return self._active(states.tgt_lang).policy(
            self._active(states.tgt_lang).states)
