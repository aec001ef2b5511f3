"""PRETSSEL expressive mel + HiFi-GAN vocoder — clean re-derivation of the
reference's flat-layer-list dataflow (models/generator/vocoder.py:165-586,
SURVEY.md §7 flags the original indexing as spaghetti; the computation is:)

  units -> embed + alpha*sinpos ----------------------------+
  prosody fbank -> ECAPA ++ lang embed = FiLM cond ---------+--> FFT encoder (FiLM)
     -> variance adaptor: + pitch(vuv-gated) & energy embeds (parallel),
        GAUSSIAN upsample by PROVIDED durations, + alpha*sinpos
     -> FFT decoder (FiLM) -> mel proj (80) -> + PostNet (5 tanh convs)
     -> gcmvn denormalize -> per-sample (x - mean)/scale
     -> HiFi-GAN (conv_pre/upsample/resblocks/conv_post) = skip waveform
     -> SEANet post-filter on skip
  out = 0.8 * seanet(skip) + tanh(skip)

Arch configs: builder.py:160-258 (16 kHz / 24 kHz).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.pretssel.ecapa_tdnn import (
    EcapaConfig, ecapa_forward, ecapa_init,
)
from seamless_communication_tpu.models.pretssel.streamable import (
    SeanetConfig, seanet_forward, seanet_init,
)
from seamless_communication_tpu.models.unity.t2u import (
    NarT2UConfig, fft_layer, fft_layer_init, _alpha_sin_pos,
    variance_predictor, variance_predictor_init,
)
from seamless_communication_tpu.models.vocoder.hifigan import (
    HifiGanConfig, hifigan_init,
)
from seamless_communication_tpu.models.vocoder import hifigan as hifigan_mod
from seamless_communication_tpu.ops.masks import lengths_to_padding_mask, padding_bias
from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, embedding, embedding_init, linear, linear_init,
)
from seamless_communication_tpu.ops.upsample import gaussian_upsample


class PretsselConfig(NamedTuple):
    num_units: int = 10005
    model_dim: int = 256
    num_heads: int = 2
    ffn_inner_dim: int = 1024
    conv_kernel_size: int = 9
    num_encoder_layers: int = 4
    num_decoder_layers: int = 4
    num_langs: int = 38
    lang_embed_dim: int = 64
    prosody_dim: int = 512          # ECAPA embed
    mel_dim: int = 80
    pn_conv_dim: int = 512
    pn_layers: int = 5
    pn_kernel_size: int = 5
    # variance adaptor (reference generator/builder.py:140-151: NO duration
    # predictor — durations are always provided; pitch/vuv/energy predictors
    # at hidden 512, kernel 5, FiLM-conditioned, added in parallel)
    var_pred_hidden: int = 512
    var_pred_kernel: int = 5
    hifigan: HifiGanConfig = HifiGanConfig(
        model_in_dim=80, upsample_rates=(5, 4, 4, 2),
        upsample_kernel_sizes=(10, 8, 8, 4), upsample_initial_channel=512,
        add_ups_out_pad=True, final_tanh=False)
    seanet: SeanetConfig = SeanetConfig()
    ecapa: EcapaConfig = EcapaConfig()
    pos_pad_idx: int = 1

    @property
    def cond_dim(self) -> int:
        return self.prosody_dim + self.lang_embed_dim

    def fft_cfg(self) -> NarT2UConfig:
        return NarT2UConfig(model_dim=self.model_dim, num_heads=self.num_heads,
                            ffn_inner_dim=self.ffn_inner_dim,
                            conv_kernel_size=self.conv_kernel_size,
                            film_cond_dim=self.cond_dim,
                            pos_pad_idx=self.pos_pad_idx)


def pretssel_init(key: jax.Array, cfg: PretsselConfig, *, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 32))
    fft = cfg.fft_cfg()
    enc_layers = [fft_layer_init(next(ks), fft, dtype=dtype)
                  for _ in range(cfg.num_encoder_layers)]
    dec_layers = [fft_layer_init(next(ks), fft, dtype=dtype)
                  for _ in range(cfg.num_decoder_layers)]
    # PostNet: Conv1d + BatchNorm1d (+ tanh except last). Inference BN is a
    # per-channel affine, folded into {"scale","bias"} at load time (reference
    # generator/vocoder.py:365-385 uses BatchNorm1d, NOT layer norm).
    pn = []
    ch_in = cfg.mel_dim
    for i in range(cfg.pn_layers):
        ch_out = cfg.pn_conv_dim if i < cfg.pn_layers - 1 else cfg.mel_dim
        pn.append({"conv": conv1d_init(next(ks), ch_in, ch_out, cfg.pn_kernel_size,
                                       dtype=dtype),
                   "norm": {"scale": jnp.ones((ch_out,), dtype),
                            "bias": jnp.zeros((ch_out,), dtype)}})
        ch_in = ch_out
    return {
        "prosody_encoder": ecapa_init(next(ks), cfg.ecapa, dtype=dtype),
        "embed_tokens": embedding_init(next(ks), cfg.num_units, cfg.model_dim,
                                       dtype=dtype),
        "embed_lang": embedding_init(next(ks), cfg.num_langs, cfg.lang_embed_dim,
                                     dtype=dtype),
        "pos_emb_alpha_enc": jnp.ones((1,), dtype),
        "pos_emb_alpha_dec": jnp.ones((1,), dtype),
        "encoder_layers": [p for p in enc_layers],
        # variance adaptor: pitch (vuv-gated) + energy predictors, embedded by
        # 1x1 convs and added in parallel (reference builder.py:347-403 builds
        # the adaptor with duration_predictor=None — durations are provided)
        "pitch_predictor": variance_predictor_init(
            next(ks), cfg.model_dim, cfg.var_pred_hidden, cfg.var_pred_kernel,
            film_cond_dim=cfg.cond_dim, dtype=dtype),
        "embed_pitch": conv1d_init(next(ks), 1, cfg.model_dim, 1, dtype=dtype),
        "vuv_predictor": variance_predictor_init(
            next(ks), cfg.model_dim, cfg.var_pred_hidden, cfg.var_pred_kernel,
            film_cond_dim=cfg.cond_dim, dtype=dtype),
        "energy_predictor": variance_predictor_init(
            next(ks), cfg.model_dim, cfg.var_pred_hidden, cfg.var_pred_kernel,
            film_cond_dim=cfg.cond_dim, dtype=dtype),
        "embed_energy": conv1d_init(next(ks), 1, cfg.model_dim, 1, dtype=dtype),
        "decoder_layers": [p for p in dec_layers],
        "final_proj": linear_init(next(ks), cfg.model_dim, cfg.mel_dim, dtype=dtype),
        "postnet": pn,
        "hifigan": hifigan_init(next(ks), cfg.hifigan, dtype=dtype),
        "seanet": seanet_init(next(ks), cfg.seanet, dtype=dtype),
        # per-card normalization stats; mean/scale are per-mel-channel buffers
        # loaded from the checkpoint (reference vocoder.py:446-449)
        "gcmvn_mean": jnp.zeros((cfg.mel_dim,), jnp.float32),
        "gcmvn_std": jnp.ones((cfg.mel_dim,), jnp.float32),
        "mean": jnp.zeros((cfg.mel_dim,), jnp.float32),
        "scale": jnp.ones((cfg.mel_dim,), jnp.float32),
    }


def pretssel_16khz_config() -> PretsselConfig:
    """Reference arch ``16khz`` (generator/builder.py:160): mel hop 160x upsample."""
    return PretsselConfig(
        hifigan=HifiGanConfig(model_in_dim=80, upsample_rates=(5, 4, 4, 2),
                              upsample_kernel_sizes=(10, 8, 8, 4),
                              upsample_initial_channel=512,
                              add_ups_out_pad=True, final_tanh=False),
        seanet=SeanetConfig(ratios=(8, 5, 4, 2), lstm=2))


def pretssel_24khz_config() -> PretsselConfig:
    """Reference arch ``24khz`` (generator/builder.py:210): 240x to 24 kHz."""
    return PretsselConfig(
        hifigan=HifiGanConfig(model_in_dim=80, upsample_rates=(5, 4, 4, 3),
                              upsample_kernel_sizes=(10, 8, 8, 6),
                              upsample_initial_channel=512,
                              add_ups_out_pad=True, final_tanh=False),
        seanet=SeanetConfig(ratios=(8, 5, 4, 2), lstm=2))


class PretsselOutput(NamedTuple):
    waveform: jax.Array       # (B, T_wav)
    sample_lengths: jax.Array
    mel: jax.Array            # (B, T_mel, 80)


def pretssel_forward(params: dict, cfg: PretsselConfig, units: jax.Array,
                     unit_lengths: jax.Array, durations: jax.Array,
                     prosody_fbank: jax.Array, prosody_lengths: jax.Array,
                     lang_id: jax.Array, *, max_mel_len: int,
                     duration_factor: float = 1.0,
                     normalize_before: bool = True) -> PretsselOutput:
    """units (B, U) +4-offset unit tokens with provided per-unit ``durations``
    (deduped units, durations x2, reference pretssel_generator.py:25-100)."""
    fft = cfg.fft_cfg()
    B, U = units.shape

    # cond embedding
    pmask = lengths_to_padding_mask(prosody_lengths, prosody_fbank.shape[1])
    prosody = ecapa_forward(params["prosody_encoder"], prosody_fbank, cfg.ecapa,
                            padding_mask=pmask)[:, None, :]          # (B,1,512)
    lang = embedding(params["embed_lang"], lang_id)[:, None, :]
    cond = jnp.concatenate([prosody, lang], axis=-1)                 # (B,1,576)

    del duration_factor  # reference parity: NO-OP for provided durations
    mel, mel_total, mmask = pretssel_premel(params, cfg, units, unit_lengths,
                                            durations, cond,
                                            max_mel_len=max_mel_len)
    mel, wav = pretssel_wave_synth(params, cfg, mel, mmask,
                                   normalize_before=normalize_before)
    return PretsselOutput(wav, mel_total * cfg.hifigan.total_upsample, mel)


def pretssel_premel(params: dict, cfg: PretsselConfig, units: jax.Array,
                    unit_lengths: jax.Array, durations: jax.Array,
                    cond: jax.Array, *, max_mel_len: int):
    """Pre-mel half of the PRETSSEL vocoder (reference generator/vocoder.py
    forward :496-513 composition):

      embed + alpha*sinpos -> FFT encoder (FiLM, POST order: no final norm)
      -> variance adaptor: + pitch(vuv-gated)/energy 1x1-conv embeds (parallel),
         gaussian upsample by PROVIDED durations -> + alpha*sinpos
      -> FFT decoder (FiLM) -> final_proj mel

    ``cond`` is the (B, 1, cond_dim) FiLM embedding (ECAPA prosody ++ lang).
    Returns (mel (B, max_mel_len, mel_dim), mel_total (B,), mel mask).
    Composition pinned by the from-spec torch oracle in
    tests/unit/test_pretssel_oracle.py (order perturbations fail it)."""
    fft = cfg.fft_cfg()
    U = units.shape[1]

    # encoder
    x = embedding(params["embed_tokens"], units)
    x = _alpha_sin_pos(x, params["pos_emb_alpha_enc"], cfg.pos_pad_idx)
    umask = lengths_to_padding_mask(unit_lengths, U)
    bias = padding_bias(umask)
    # norm_order POST: no final layer norm (reference generator/builder.py:304)
    for lp in params["encoder_layers"]:
        x = fft_layer(lp, x, bias, umask, fft, cond=cond)

    # variance adaptor (reference length_regulator.py:275-321, built with
    # duration_predictor=None — builder.py:392-403): pitch is vuv-gated, pitch
    # and energy embeddings are added in PARALLEL (add_variance_parallel=True),
    # both computed from the pre-addition hidden states. Provided durations
    # pass through unchanged (duration_factor only applies to PREDICTED
    # durations in the reference; the expressive CLI's factor acts in the NAR
    # T2U duration predictor upstream, never here).
    pitch = variance_predictor(params["pitch_predictor"], x, umask, cond=cond)
    vuv = variance_predictor(params["vuv_predictor"], x, umask, cond=cond)
    pitch = pitch * (jax.nn.sigmoid(vuv) >= 0.5).astype(pitch.dtype)
    pitch_emb = conv1d(params["embed_pitch"], pitch[..., None].astype(x.dtype))
    energy = variance_predictor(params["energy_predictor"], x, umask, cond=cond)
    energy_emb = conv1d(params["embed_energy"], energy[..., None].astype(x.dtype))
    x = x + pitch_emb + energy_emb

    # gaussian upsampling with provided durations (upsampling_type="gaussian",
    # builder.py:149; masked by the SOURCE padding mask so the duration-0
    # expressive EOS unit is still attended, exactly as the reference)
    dur = jnp.where(umask, durations.astype(jnp.int32), 0)
    x, mel_total = gaussian_upsample(x, dur, max_mel_len, src_mask=umask)
    mel_total = jnp.minimum(mel_total, max_mel_len)
    x = _alpha_sin_pos(x, params["pos_emb_alpha_dec"], cfg.pos_pad_idx)

    mmask = lengths_to_padding_mask(mel_total, max_mel_len)
    mbias = padding_bias(mmask)
    for lp in params["decoder_layers"]:
        x = fft_layer(lp, x, mbias, mmask, fft, cond=cond)
    mel = linear(params["final_proj"], x)                            # (B,T,80)
    return mel, mel_total, mmask


def pretssel_wave_synth(params: dict, cfg: PretsselConfig, mel: jax.Array,
                        mmask: jax.Array, *, normalize_before: bool = True):
    """Post-mel half of the PRETSSEL vocoder (the composition the reference
    interleaves through its flat layer list, generator/vocoder.py:476-573):

      postnet residual -> gcmvn DEnormalize -> per-sample (x-mean)/scale ->
      HiFi-GAN -> skip; SEANet(skip) -> 0.8*refined + tanh(skip)

    Returns (gcmvn-denormalized mel, waveform). Composition order is pinned by
    the from-spec torch oracle in tests/unit/test_pretssel_oracle.py.
    """
    # postnet (conv + folded-BN affine + tanh except last, residual;
    # reference vocoder.py:365-385,508-513)
    pn = mel
    for i, lp in enumerate(params["postnet"]):
        pn = conv1d(lp["conv"], pn, padding="SAME")
        pn = pn * lp["norm"]["scale"].astype(pn.dtype) \
            + lp["norm"]["bias"].astype(pn.dtype)
        if i < cfg.pn_layers - 1:
            pn = jnp.tanh(pn)
    mel = mel + pn

    # gcmvn denormalize + per-sample normalization
    mel = mel * params["gcmvn_std"][None, None] + params["gcmvn_mean"][None, None]
    if normalize_before:
        mel_in = (mel - params["mean"]) / params["scale"]
    else:
        mel_in = mel
    # zero padded frames AFTER the normalizations so the synth convs see the
    # same zeros the reference's SAME padding injects at its (truncated) end
    # (reference synthesizes per sample on length-truncated mel, vocoder.py:518)
    mel = mel * mmask[..., None].astype(mel.dtype)
    mel_in = mel_in * mmask[..., None].astype(mel_in.dtype)

    # waveform synthesis: HiFi-GAN skip + SEANet post-filter
    skip = hifigan_mod.hifigan_forward(params["hifigan"], mel_in, cfg.hifigan)
    refined = seanet_forward(params["seanet"], skip[..., None], cfg.seanet)[..., 0]
    T = min(skip.shape[1], refined.shape[1])
    wav = 0.8 * refined[:, :T] + jnp.tanh(skip[:, :T])
    return mel, wav
