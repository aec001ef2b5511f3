"""Unit-code HiFi-GAN vocoder (reference models/vocoder/codehifigan.py:16-101).

unit ids -> 1280-d unit embeddings -> optional duration predictor +
duration-repeat (static-shape hard upsample) -> concat [lang ; units ; spkr]
channel-wise (1792ch) -> HiFi-GAN (320x upsample, 50 Hz units -> 16 kHz audio).

Speaker/language ids resolve through the asset card's ``lang_spkr_idx_map``
(models/vocoder/vocoder.py:15-49) at the inference layer.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.unity.t2u import (
    durations_from_log, variance_predictor, variance_predictor_init,
)
from seamless_communication_tpu.models.vocoder.hifigan import (
    HifiGanConfig, hifigan_forward, hifigan_init,
)
from seamless_communication_tpu.ops.modules import embedding, embedding_init
from seamless_communication_tpu.ops.upsample import hard_upsample


class CodeHifiGanConfig(NamedTuple):
    num_units: int = 10000
    unit_embed_dim: int = 1280
    num_langs: int = 36
    lang_embed_dim: int = 256
    num_spkrs: int = 200
    spkr_embed_dim: int = 256
    dur_predictor_hidden: int = 1280
    dur_predictor_kernel: int = 3
    hifigan: HifiGanConfig = HifiGanConfig()


def code_hifigan_init(key: jax.Array, cfg: CodeHifiGanConfig, *,
                      dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    return {
        "unit_embedding": embedding_init(ks[0], cfg.num_units, cfg.unit_embed_dim,
                                         dtype=dtype),
        "speaker_embedding": embedding_init(ks[1], cfg.num_spkrs, cfg.spkr_embed_dim,
                                            dtype=dtype),
        "language_embedding": embedding_init(ks[2], cfg.num_langs, cfg.lang_embed_dim,
                                             dtype=dtype),
        "dur_predictor": variance_predictor_init(
            ks[3], cfg.unit_embed_dim, cfg.dur_predictor_hidden,
            cfg.dur_predictor_kernel, dtype=dtype),
        "hifigan": hifigan_init(ks[4], cfg.hifigan, dtype=dtype),
    }


class VocoderOutput(NamedTuple):
    waveform: jax.Array        # (B, max_units * 320)
    sample_lengths: jax.Array  # (B,)


def code_hifigan_forward(params: dict, cfg: CodeHifiGanConfig, units: jax.Array,
                         unit_lengths: jax.Array, lang_id: jax.Array,
                         spkr_id: jax.Array, *, dur_prediction: bool = True,
                         max_unit_len: Optional[int] = None) -> VocoderOutput:
    """units: (B, U) raw unit ids; lang_id/spkr_id: (B,) int ids.

    With ``dur_prediction`` (offline S2ST, units are deduped), each unit is repeated
    by the predicted duration; streaming passes dur_prediction=False
    (streaming/agents/online_vocoder.py:43-69).
    """
    B, U = units.shape
    x = embedding(params["unit_embedding"], jnp.clip(units, 0, cfg.num_units - 1))
    valid = jnp.arange(U)[None, :] < unit_lengths[:, None]

    if dur_prediction:
        log_dur = variance_predictor(params["dur_predictor"], x, valid)
        dur = durations_from_log(log_dur, valid)
        out_len = max_unit_len or U * 4
        x, total = hard_upsample(x, dur, out_len)
    else:
        x = x * valid[..., None].astype(x.dtype)
        total = unit_lengths

    lang = embedding(params["language_embedding"], lang_id)[:, None, :]
    spkr = embedding(params["speaker_embedding"], spkr_id)[:, None, :]
    T = x.shape[1]
    feats = jnp.concatenate([
        jnp.broadcast_to(lang, (B, T, lang.shape[-1])),
        x,
        jnp.broadcast_to(spkr, (B, T, spkr.shape[-1])),
    ], axis=-1)

    wav = hifigan_forward(params["hifigan"], feats, cfg.hifigan)
    return VocoderOutput(wav, total * cfg.hifigan.total_upsample)
