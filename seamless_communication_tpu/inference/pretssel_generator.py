"""PretsselGenerator (reference cli/expressivity/predict/pretssel_generator.py:25-100):
batch unit sequences for the PRETSSEL vocoder — unique_consecutive dedup,
durations x2, trailing EOS duration 0 — and synthesize expressive waveforms using
the source utterance's gcmvn-normalized fbank as prosody input."""

from __future__ import annotations

from typing import List

import numpy as np

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.pretssel.vocoder import (
    PretsselConfig, pretssel_forward,
)


def unique_consecutive(units: List[int]) -> tuple[List[int], List[int]]:
    out, durs = [], []
    for u in units:
        if out and out[-1] == u:
            durs[-1] += 1
        else:
            out.append(u)
            durs.append(1)
    return out, durs


class PretsselGenerator:
    def __init__(self, params: dict, cfg: PretsselConfig, *,
                 lang_to_index: dict, sample_rate: int = 16000):
        self.params = params
        self.cfg = cfg
        self.lang_to_index = lang_to_index
        self.sample_rate = sample_rate
        self._fn = jax.jit(
            lambda p, u, ul, d, pf, pl, lid, df, M: pretssel_forward(
                p, cfg, u, ul, d, pf, pl, lid, max_mel_len=M, duration_factor=df),
            static_argnames=("M",))

    def predict(self, units_batch: List[List[int]], tgt_lang: str,
                prosody_fbank: np.ndarray, prosody_lens: np.ndarray, *,
                duration_factor: float = 1.0) -> List[np.ndarray]:
        """units are raw ids; +4 control offset applied here
        (reference pretssel_vocoder agent: unit+4; EOS gets duration 0).

        ``duration_factor`` is accepted for API parity but is a NO-OP, exactly
        as in the reference: PRETSSEL's variance adaptor has no duration
        predictor, so provided durations pass through unchanged and the
        expressive CLI's factor acts in the NAR T2U predictor upstream."""
        lang_id = self.lang_to_index.get(tgt_lang, 0)
        wavs = []
        for b, units in enumerate(units_batch):
            if not units:
                wavs.append(np.zeros(0, np.float32))
                continue
            uniq, durs = unique_consecutive(units)
            toks = [u + 4 for u in uniq] + [2]          # trailing EOS token
            durs = [d * 2 for d in durs] + [0]          # durations x2, EOS dur 0
            U = max(8, -(-len(toks) // 8) * 8)
            u_arr = np.ones((1, U), np.int32)           # pad = 1
            d_arr = np.zeros((1, U), np.int32)
            u_arr[0, :len(toks)] = toks
            d_arr[0, :len(durs)] = durs
            M = max(64, -(-sum(durs) // 64) * 64)
            out = self._fn(self.params, jnp.asarray(u_arr),
                           jnp.asarray([len(toks)], jnp.int32), jnp.asarray(d_arr),
                           jnp.asarray(prosody_fbank[b:b + 1]),
                           jnp.asarray(prosody_lens[b:b + 1]),
                           jnp.asarray([lang_id]), duration_factor, M)
            wavs.append(np.asarray(out.waveform[0, :int(out.sample_lengths[0])]))
        return wavs
