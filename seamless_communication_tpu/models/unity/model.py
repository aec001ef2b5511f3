"""UnitY multitask model container (reference models/unity/model.py:28-193).

Pure-functional: ``unity_init`` builds the parameter pytree; the forward surface is a
set of functions mirroring the reference API:
    encode_speech / encode_text / decode (full-seq) / decode_step (KV-cached) /
    project (tied final proj) / t2u paths.
The X2T "view" used for beam-search generation (UnitYX2TModel, model.py:196-260) is
just ``encode_* + decode_step`` here — no wrapper object needed.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.nllb.model import (
    text_decoder_cache, text_decoder_forward, text_decoder_init, text_decoder_step,
    text_encoder_forward, text_encoder_init,
)
from seamless_communication_tpu.models.pretssel.ecapa_tdnn import (
    ecapa_forward, ecapa_init,
)
from seamless_communication_tpu.models.unity.builder import UnitYConfig
from seamless_communication_tpu.models.unity.t2u import (
    ar_t2u_init, nar_t2u_forward, nar_t2u_init,
)
from seamless_communication_tpu.models.wav2vec2.encoder import (
    speech_encoder_forward, speech_encoder_init,
)
from seamless_communication_tpu.ops.masks import lengths_to_padding_mask
from seamless_communication_tpu.ops.transformer import tied_projection


def unity_init(key: jax.Array, cfg: UnitYConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    params = {
        "speech_encoder": speech_encoder_init(ks[0], cfg.speech, dtype=dtype),
        "text_decoder": text_decoder_init(ks[2], cfg.nllb, dtype=dtype),
    }
    if cfg.use_text_encoder:
        # NLLB ties encoder/decoder/output embeddings — share one table
        params["text_encoder"] = text_encoder_init(ks[1], cfg.nllb, dtype=dtype)
        params["text_encoder"]["embed"] = params["text_decoder"]["embed"]
    if cfg.nar_t2u is not None:
        params["t2u"] = nar_t2u_init(ks[3], cfg.nar_t2u, dtype=dtype)
    elif cfg.ar_t2u is not None:
        params["t2u"] = ar_t2u_init(ks[3], cfg.ar_t2u, dtype=dtype)
    if cfg.ecapa is not None:
        # expressive models own an ECAPA prosody encoder (reference
        # builder.py:472-478 global_prosody, converted as prosody_encoder_model)
        params["prosody_encoder"] = ecapa_init(ks[4], cfg.ecapa, dtype=dtype)
    return params


class EncoderOutput(NamedTuple):
    seqs: jax.Array      # (B, S, D)
    lengths: jax.Array   # (B,)

    @property
    def padding_mask(self):
        return lengths_to_padding_mask(self.lengths, self.seqs.shape[1])


def encode_speech(params: dict, cfg: UnitYConfig, fbank: jax.Array,
                  frame_lens: jax.Array) -> EncoderOutput:
    seqs, lens = speech_encoder_forward(params["speech_encoder"], fbank, frame_lens,
                                        cfg.speech)
    return EncoderOutput(seqs, lens)


def encode_text(params: dict, cfg: UnitYConfig, ids: jax.Array,
                lengths: jax.Array) -> EncoderOutput:
    seqs, _ = text_encoder_forward(params["text_encoder"], ids, lengths, cfg.nllb)
    return EncoderOutput(seqs, lengths)


def decode_text(params: dict, cfg: UnitYConfig, ids: jax.Array, enc: EncoderOutput, *,
                self_lengths: Optional[jax.Array] = None) -> jax.Array:
    """Full-sequence text decode -> (B, T, D) features (used for T2U input,
    reference generator.py:294-299)."""
    mask = (lengths_to_padding_mask(self_lengths, ids.shape[1])
            if self_lengths is not None else None)
    return text_decoder_forward(params["text_decoder"], ids, enc.seqs, cfg.nllb,
                                enc_padding_mask=enc.padding_mask,
                                self_padding_mask=mask)


def project(params: dict, features: jax.Array) -> jax.Array:
    return tied_projection(params["text_decoder"]["embed"], features)


def make_text_decode_step(params: dict, cfg: UnitYConfig, enc: EncoderOutput, *,
                          candidates: Optional[int] = None):
    """Build the beam-search step_fn + cache factory for the X2T view.

    ``candidates=k``: step_fn returns the per-beam top-k candidate triple for
    beam_search(candidate_mode=True) via the fused vocab-projection+top-k
    kernel (models/nllb/model.py text_decoder_step_topk)."""
    from seamless_communication_tpu.models.nllb.model import (
        text_decoder_step_topk,
    )
    from seamless_communication_tpu.ops.transformer import unstack_layer_params

    mask = enc.padding_mask
    # hoist the per-layer weight slices (and their MXU relayouts) out of the
    # decode while-loop — they are loop-invariant
    dec_params = dict(params["text_decoder"])
    dec_params["stack"] = unstack_layer_params(dec_params["stack"])

    if candidates is not None:
        def step_fn(tok_t, cache, step, beam_src=None):
            return text_decoder_step_topk(dec_params, tok_t, cache, step,
                                          cfg.nllb, candidates,
                                          enc_padding_mask=mask,
                                          beam_src=beam_src)
    else:
        def step_fn(tok_t, cache, step, beam_src=None):
            return text_decoder_step(dec_params, tok_t, cache, step, cfg.nllb,
                                     enc_padding_mask=mask, beam_src=beam_src)

    def cache_fn(max_len: int, kv_int8: bool = False, per_layer: bool = True,
                 kv_bits: int = 8):
        return text_decoder_cache(params["text_decoder"], cfg.nllb, enc.seqs,
                                  max_len, kv_int8=kv_int8,
                                  per_layer=per_layer, kv_bits=kv_bits)

    return step_fn, cache_fn


def encode_prosody(params: dict, cfg: UnitYConfig, fbank: jax.Array,
                   lengths: jax.Array) -> jax.Array:
    """gcmvn-normalized fbank -> (B, 1, prosody_dim) ECAPA embedding, used as
    both the T2U prosody_proj input and the FiLM condition (reference
    inference/generator.py:306-314, models/unity/model.py:379-402)."""
    mask = lengths_to_padding_mask(lengths, fbank.shape[1])
    emb = ecapa_forward(params["prosody_encoder"], fbank, cfg.ecapa,
                        padding_mask=mask)
    return emb[:, None, :]


def t2u_nar(params: dict, cfg: UnitYConfig, text_dec_out: jax.Array,
            text_lens: jax.Array, char_ids: jax.Array, char_counts: jax.Array, *,
            max_unit_len: int, duration_factor: float = 1.0,
            prosody_embed: Optional[jax.Array] = None,
            film_cond: Optional[jax.Array] = None):
    return nar_t2u_forward(params["t2u"], cfg.nar_t2u, text_dec_out, text_lens,
                           char_ids, char_counts, max_unit_len=max_unit_len,
                           duration_factor=duration_factor,
                           prosody_embed=prosody_embed, film_cond=film_cond)
