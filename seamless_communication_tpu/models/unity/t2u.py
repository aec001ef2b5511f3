"""Text-to-unit (T2U) models.

- **NAR (UnitY2, v2)**: 6-layer transformer encoder over text-decoder features, then a
  char-level non-autoregressive decoder: hard-upsample features to char length, add
  char embeddings + alpha-scaled sinusoidal positions, predict per-char durations
  (VariancePredictor), hard-upsample to unit length, run post-LN FFT layers
  (self-attn + two same-pad convs), project to unit vocab.
  Reference: models/unity/model.py:330-441, nar_decoder_frontend.py:299-334,
  length_regulator.py:99-321, fft_decoder_layer.py; conventions validated against
  HF SeamlessM4Tv2TextToUnitDecoder.

- **AR (UnitY, v1)**: standard transformer encoder-decoder over the unit vocabulary
  with tied final projection (models/unity/model.py:263-327), decoded with the shared
  compiled beam-search.

Expressive (Prosody UnitY2) additions: FiLM conditioning in the variance predictor and
FFT layers + a prosody projection added to encoder output (model.py:379-402,
t2u_builder.py expressivity_nar arch).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from seamless_communication_tpu.models.unity.film import film, film_init
from seamless_communication_tpu.ops import attention as attn_ops
from seamless_communication_tpu.ops.masks import (
    apply_padding_mask, lengths_to_padding_mask, padding_bias,
)
from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, embedding, embedding_init, layer_norm, layer_norm_init,
    linear, linear_init,
)
from seamless_communication_tpu.ops.positional import sinusoidal_positions
from seamless_communication_tpu.ops.transformer import (
    TransformerConfig, embedding_frontend, tied_projection, transformer_decoder,
    transformer_decoder_step, transformer_encoder, transformer_stack_init,
    decoder_cache_init,
)
from seamless_communication_tpu.ops.upsample import hard_upsample


class NarT2UConfig(NamedTuple):
    model_dim: int = 1024
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 16
    ffn_inner_dim: int = 8192
    unit_vocab_size: int = 10082
    char_vocab_size: int = 10943
    conv_kernel_size: int = 7
    dur_predictor_hidden: int = 256
    dur_predictor_kernel: int = 3
    pad_idx: int = 1                 # unit vocab: bos=0 pad=1 eos=2 unk=3
    char_pad_idx: int = 1
    pos_pad_idx: int = 1             # sinusoidal-table offset = unit pad (t2u_pad_token_id)
    max_seq_len: int = 4096
    # expressive (FiLM) conditioning
    film_cond_dim: int = 0           # 0 = disabled; expressivity_nar: 512
    prosody_proj_dim: int = 0        # ECAPA embedding dim projected & added (512)

    def enc_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.model_dim, self.num_encoder_layers,
                                 self.num_heads, self.ffn_inner_dim, "relu",
                                 self.unit_vocab_size, self.pad_idx,
                                 self.max_seq_len, False)


# ---------------------------------------------------------------------------
# Variance predictor (reference length_regulator.py:99-218)
# ---------------------------------------------------------------------------

def variance_predictor_init(key, dim, hidden, kernel, *, film_cond_dim=0,
                            dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 4)
    p = {
        "conv1": conv1d_init(ks[0], dim, hidden, kernel, dtype=dtype),
        "ln1": layer_norm_init(hidden, dtype=dtype),
        "conv2": conv1d_init(ks[1], hidden, hidden, kernel, dtype=dtype),
        "ln2": layer_norm_init(hidden, dtype=dtype),
        "proj": linear_init(ks[2], hidden, 1, dtype=dtype),
    }
    if film_cond_dim:
        p["film"] = film_init(ks[3], film_cond_dim, hidden, dtype=dtype)
    return p


def variance_predictor(p: dict, x: jax.Array, padding_mask: Optional[jax.Array],
                       *, cond: Optional[jax.Array] = None) -> jax.Array:
    """(B, T, D) -> (B, T) raw log-duration predictions."""
    h = apply_padding_mask(x, padding_mask)
    h = jax.nn.relu(conv1d(p["conv1"], h, padding="SAME"))
    h = layer_norm(p["ln1"], h)
    h = apply_padding_mask(h, padding_mask)
    h = jax.nn.relu(conv1d(p["conv2"], h, padding="SAME"))
    h = layer_norm(p["ln2"], h)
    if "film" in p and cond is not None:
        h = film(p["film"], h, cond)
    return linear(p["proj"], h)[..., 0]


def durations_from_log(log_dur: jax.Array, padding_mask: Optional[jax.Array], *,
                       duration_factor: float = 1.0, min_duration: int = 1
                       ) -> jax.Array:
    """clamp(round((exp(d) - 1) * factor), min) with pad positions zeroed
    (reference VarianceAdaptor, length_regulator.py:275-321)."""
    dur = jnp.clip(jnp.round(jnp.expm1(log_dur.astype(jnp.float32)) * duration_factor),
                   min_duration, None).astype(jnp.int32)
    if padding_mask is not None:
        dur = jnp.where(padding_mask, dur, 0)
    return dur


# ---------------------------------------------------------------------------
# Post-LN FFT decoder layer (reference fft_decoder_layer.py; HF TextToUnitDecoderLayer)
# ---------------------------------------------------------------------------

def fft_layer_init(key, cfg: NarT2UConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 5)
    d = cfg.model_dim
    p = {
        "self_attn": attn_ops.mha_init(ks[0], d, cfg.num_heads, dtype=dtype),
        "self_attn_layer_norm": layer_norm_init(d, dtype=dtype),
        "conv1": conv1d_init(ks[1], d, d, cfg.conv_kernel_size, dtype=dtype),
        "conv2": conv1d_init(ks[2], d, d, cfg.conv_kernel_size, dtype=dtype),
        "conv_layer_norm": layer_norm_init(d, dtype=dtype),
    }
    if cfg.film_cond_dim:
        p["film"] = film_init(ks[3], cfg.film_cond_dim, d, dtype=dtype)
    return p


def fft_layer(p: dict, x: jax.Array, bias: Optional[jax.Array],
              padding_mask: Optional[jax.Array], cfg: NarT2UConfig, *,
              cond: Optional[jax.Array] = None) -> jax.Array:
    h = attn_ops.multi_head_attention(p["self_attn"], x, x, cfg.num_heads, bias=bias)
    x = layer_norm(p["self_attn_layer_norm"], x + h)
    res = x
    h = apply_padding_mask(x, padding_mask)
    h = conv1d(p["conv1"], h, padding="SAME")
    h = apply_padding_mask(h, padding_mask)
    h = jax.nn.relu(h)
    h = conv1d(p["conv2"], h, padding="SAME")
    x = layer_norm(p["conv_layer_norm"], res + h)
    if "film" in p and cond is not None:
        x = film(p["film"], x, cond)
    return x


# ---------------------------------------------------------------------------
# NAR T2U model
# ---------------------------------------------------------------------------

def nar_t2u_init(key: jax.Array, cfg: NarT2UConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    layers = [fft_layer_init(k, cfg, dtype=dtype)
              for k in jax.random.split(ks[0], cfg.num_decoder_layers)]
    p = {
        "encoder": transformer_stack_init(ks[1], cfg.enc_cfg(), dtype=dtype),
        "embed_char": embedding_init(ks[2], cfg.char_vocab_size, cfg.model_dim, dtype=dtype),
        "pos_emb_alpha_char": jnp.ones((1,), dtype),
        "pos_emb_alpha": jnp.ones((1,), dtype),
        "duration_predictor": variance_predictor_init(
            ks[3], cfg.model_dim, cfg.dur_predictor_hidden, cfg.dur_predictor_kernel,
            film_cond_dim=cfg.film_cond_dim, dtype=dtype),
        "decoder_layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "layer_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
        "final_proj": linear_init(ks[4], cfg.model_dim, cfg.unit_vocab_size, dtype=dtype),
    }
    if cfg.prosody_proj_dim:
        p["prosody_proj"] = linear_init(ks[5], cfg.prosody_proj_dim, cfg.model_dim,
                                        dtype=dtype)
    return p


class NarT2UOutput(NamedTuple):
    unit_logits: jax.Array   # (B, U_max, unit_vocab) fp32
    unit_lengths: jax.Array  # (B,)
    durations: jax.Array     # (B, C_max) predicted per-char durations
    char_lengths: jax.Array  # (B,)


def _alpha_sin_pos(x: jax.Array, alpha: jax.Array, pad_idx: int) -> jax.Array:
    T, D = x.shape[1], x.shape[2]
    table = sinusoidal_positions(T + pad_idx + 2, D, padding_idx=pad_idx, dtype=x.dtype)
    pos = table[pad_idx + 1: pad_idx + 1 + T]
    return x + alpha.astype(x.dtype) * pos[None]


def nar_t2u_decode(params: dict, cfg: NarT2UConfig, enc: jax.Array,
                   char_ids: jax.Array, char_counts: jax.Array, *,
                   max_unit_len: int, duration_factor: float = 1.0,
                   film_cond: Optional[jax.Array] = None) -> NarT2UOutput:
    """Char-level NAR decode of T2U-encoder features ``enc`` (B, T, D).

    char_ids: (B, C_max) char token ids (host-precomputed, reference
    nar_decoder_frontend.py:227-259 moved to the tokenizer layer);
    char_counts: (B, T) chars per subword token (0 on pads/strip positions).
    """
    C = char_ids.shape[1]

    # char-level upsampling of encoder features
    char_hidden, char_total = hard_upsample(enc, char_counts, C)
    char_mask = lengths_to_padding_mask(char_total, C)
    char_emb = embedding(params["embed_char"], char_ids, scale=cfg.model_dim ** 0.5)
    char_hidden = _alpha_sin_pos(char_hidden, params["pos_emb_alpha_char"],
                                 cfg.pos_pad_idx) + char_emb

    # durations
    log_dur = variance_predictor(params["duration_predictor"], char_hidden, char_mask,
                                 cond=film_cond)
    dur = durations_from_log(log_dur, char_mask, duration_factor=duration_factor)

    # unit-level upsampling
    x, unit_total = hard_upsample(char_hidden, dur, max_unit_len)
    unit_total = jnp.minimum(unit_total, max_unit_len)
    x = _alpha_sin_pos(x, params["pos_emb_alpha"], cfg.pos_pad_idx)

    unit_mask = lengths_to_padding_mask(unit_total, max_unit_len)
    bias = padding_bias(unit_mask)

    def body(h, layer_p):
        return fft_layer(layer_p, h, bias, unit_mask, cfg, cond=film_cond), None

    x, _ = jax.lax.scan(body, x, params["decoder_layers"])
    x = layer_norm(params["layer_norm"], x)
    logits = linear(params["final_proj"], x).astype(jnp.float32)
    return NarT2UOutput(logits, unit_total, dur, char_total)


def nar_t2u_forward(params: dict, cfg: NarT2UConfig, text_dec_out: jax.Array,
                    text_lens: jax.Array, char_ids: jax.Array,
                    char_counts: jax.Array, *, max_unit_len: int,
                    duration_factor: float = 1.0,
                    prosody_embed: Optional[jax.Array] = None,
                    film_cond: Optional[jax.Array] = None) -> NarT2UOutput:
    """Full NAR T2U pass: 6-layer encoder over text-decoder features (+ optional
    prosody projection, reference model.py:379-402), then char-level NAR decode."""
    text_mask = lengths_to_padding_mask(text_lens, text_dec_out.shape[1])
    enc = transformer_encoder(params["encoder"], text_dec_out, cfg.enc_cfg(),
                              padding_mask=text_mask)
    if prosody_embed is not None and "prosody_proj" in params:
        enc = enc + linear(params["prosody_proj"], prosody_embed)
    return nar_t2u_decode(params, cfg, enc, char_ids, char_counts,
                          max_unit_len=max_unit_len,
                          duration_factor=duration_factor, film_cond=film_cond)


class NarT2UTrainOutput(NamedTuple):
    unit_logits: jax.Array   # (B, U_max, unit_vocab) fp32 (teacher-forced durs)
    log_dur_pred: jax.Array  # (B, C_max) raw predictor output
    unit_lengths: jax.Array  # (B,) from ground-truth durations
    char_mask: jax.Array     # (B, C_max) True on real chars


def nar_t2u_train(params: dict, cfg: NarT2UConfig, text_dec_out: jax.Array,
                  text_lens: jax.Array, char_ids: jax.Array,
                  char_counts: jax.Array, gt_durations: jax.Array, *,
                  max_unit_len: int,
                  prosody_embed: Optional[jax.Array] = None,
                  film_cond: Optional[jax.Array] = None) -> NarT2UTrainOutput:
    """Teacher-forced NAR T2U pass for finetuning (exceeds the reference, whose
    trainer only supports AR T2U — cli/m4t/finetune/trainer.py:124-150 raises
    NotImplementedError for NAR): upsample with GROUND-TRUTH per-char durations
    (from the UnitY2 aligner) and return both unit logits and the raw duration
    predictions for the FastSpeech2-style log-duration loss."""
    text_mask = lengths_to_padding_mask(text_lens, text_dec_out.shape[1])
    enc = transformer_encoder(params["encoder"], text_dec_out, cfg.enc_cfg(),
                              padding_mask=text_mask)
    if prosody_embed is not None and "prosody_proj" in params:
        enc = enc + linear(params["prosody_proj"], prosody_embed)

    C = char_ids.shape[1]
    char_hidden, char_total = hard_upsample(enc, char_counts, C)
    char_mask = lengths_to_padding_mask(char_total, C)
    char_emb = embedding(params["embed_char"], char_ids, scale=cfg.model_dim ** 0.5)
    char_hidden = _alpha_sin_pos(char_hidden, params["pos_emb_alpha_char"],
                                 cfg.pos_pad_idx) + char_emb

    log_dur = variance_predictor(params["duration_predictor"], char_hidden,
                                 char_mask, cond=film_cond)

    dur = jnp.where(char_mask, gt_durations.astype(jnp.int32), 0)
    x, unit_total = hard_upsample(char_hidden, dur, max_unit_len)
    unit_total = jnp.minimum(unit_total, max_unit_len)
    x = _alpha_sin_pos(x, params["pos_emb_alpha"], cfg.pos_pad_idx)

    unit_mask = lengths_to_padding_mask(unit_total, max_unit_len)
    bias = padding_bias(unit_mask)

    def body(h, layer_p):
        return fft_layer(layer_p, h, bias, unit_mask, cfg, cond=film_cond), None

    x, _ = jax.lax.scan(body, x, params["decoder_layers"])
    x = layer_norm(params["layer_norm"], x)
    logits = linear(params["final_proj"], x).astype(jnp.float32)
    return NarT2UTrainOutput(logits, log_dur, unit_total, char_mask)


# ---------------------------------------------------------------------------
# AR T2U model (v1) — reference models/unity/model.py:263-327
# ---------------------------------------------------------------------------

class ArT2UConfig(NamedTuple):
    model_dim: int = 1024
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_heads: int = 16
    ffn_inner_dim: int = 8192
    unit_vocab_size: int = 10082
    pad_idx: int = 1
    eos_idx: int = 2
    unk_idx: int = 3
    bos_idx: int = 0
    max_seq_len: int = 2048

    def enc_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.model_dim, self.num_encoder_layers,
                                 self.num_heads, self.ffn_inner_dim, "relu",
                                 self.unit_vocab_size, self.pad_idx,
                                 self.max_seq_len, False)

    def dec_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.model_dim, self.num_decoder_layers,
                                 self.num_heads, self.ffn_inner_dim, "relu",
                                 self.unit_vocab_size, self.pad_idx,
                                 self.max_seq_len, True)


def ar_t2u_init(key: jax.Array, cfg: ArT2UConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "encoder": transformer_stack_init(ks[0], cfg.enc_cfg(), dtype=dtype),
        "embed": embedding_init(ks[1], cfg.unit_vocab_size, cfg.model_dim, dtype=dtype),
        "decoder": transformer_stack_init(ks[2], cfg.dec_cfg(), dtype=dtype),
    }


def ar_t2u_encode(params: dict, cfg: ArT2UConfig, text_dec_out: jax.Array,
                  text_lens: jax.Array) -> tuple[jax.Array, jax.Array]:
    mask = lengths_to_padding_mask(text_lens, text_dec_out.shape[1])
    return transformer_encoder(params["encoder"], text_dec_out, cfg.enc_cfg(),
                               padding_mask=mask), mask


def ar_t2u_decoder_step(params: dict, tok_t: jax.Array, cache, step, cfg: ArT2UConfig,
                        *, enc_padding_mask=None, beam_src=None):
    x = embedding_frontend(params["embed"], tok_t, cfg.dec_cfg(), start_step=step)
    h, cache = transformer_decoder_step(params["decoder"], x, cache, step,
                                        cfg.dec_cfg(), enc_padding_mask=enc_padding_mask,
                                        beam_src=beam_src)
    return tied_projection(params["embed"], h)[:, 0], cache


def ar_t2u_cache(params: dict, cfg: ArT2UConfig, enc_out: jax.Array, max_len: int,
                 kv_int8: bool = False):
    return decoder_cache_init(params["decoder"], cfg.dec_cfg(), enc_out, max_len,
                              per_layer=True, kv_int8=kv_int8)
