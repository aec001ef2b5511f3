"""SEANet/EnCodec-style streamable conv stack used as PRETSSEL's waveform
post-filter (reference models/generator/streamable.py:125-452).

Pieces: StreamableConv1d (causal or centered asymmetric pad), ConvTranspose with
right-trim, two-conv residual blocks (ELU, k=[3,1]), skip-connected LSTM. All in
(B, T, C) layout; weight-norm folded at load.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, conv_transpose1d, conv_transpose1d_init, linear_init, linear,
)

ELU_ALPHA = 1.0


def _elu(x):
    return jax.nn.elu(x, alpha=ELU_ALPHA)


def streamable_conv(params: dict, x: jax.Array, *, stride: int = 1,
                    dilation: int = 1, causal: bool = False) -> jax.Array:
    """Conv with EnCodec padding: total pad = k_eff - stride (extra on the right in
    centered mode; all-left in causal mode) — reference streamable.py
    get_extra_padding_for_conv1d / pad1d semantics."""
    k = params["weight"].shape[0]
    k_eff = (k - 1) * dilation + 1
    T = x.shape[1]
    n_frames = (T - k_eff + (k_eff - stride)) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + k_eff - (k_eff - stride)
    extra = max(0, int(ideal - T))
    total_pad = k_eff - stride
    if causal:
        pad = (total_pad, extra)
    else:
        # odd totals put the extra zero on the LEFT (reference streamable.py:
        # 277-283: padding_right = total // 2; padding_left = total - right)
        right = total_pad // 2
        pad = (total_pad - right, right + extra)
    return conv1d(params, x, stride=stride, padding=pad, dilation=dilation)


def streamable_conv_transpose(params: dict, x: jax.Array, *, stride: int,
                              causal: bool = False,
                              trim_right_ratio: float = 1.0) -> jax.Array:
    k = params["weight"].shape[0]
    y = conv_transpose1d(params, x, stride=stride, padding=0)
    pad_total = k - stride
    if causal:
        pad_right = math.ceil(pad_total * trim_right_ratio)
        pad_left = pad_total - pad_right
    else:
        pad_right = pad_total // 2
        pad_left = pad_total - pad_right
    end = y.shape[1] - pad_right
    return y[:, pad_left:end]


# ---------------------------------------------------------------------------
# resnet block
# ---------------------------------------------------------------------------

def resnet_block_init(key, dim: int, kernel_sizes=(3, 1), *, compress: int = 2,
                      true_skip: bool = True, dtype=jnp.float32) -> dict:
    hidden = dim // compress
    ks = jax.random.split(key, 3)
    p = {
        "conv1": conv1d_init(ks[0], dim, hidden, kernel_sizes[0], dtype=dtype),
        "conv2": conv1d_init(ks[1], hidden, dim, kernel_sizes[1], dtype=dtype),
    }
    if not true_skip:
        p["shortcut"] = conv1d_init(ks[2], dim, dim, 1, dtype=dtype)
    return p


def resnet_block(p: dict, x: jax.Array, *, causal: bool = False) -> jax.Array:
    h = _elu(x)
    h = streamable_conv(p["conv1"], h, causal=causal)
    h = _elu(h)
    h = streamable_conv(p["conv2"], h, causal=causal)
    skip = x if "shortcut" not in p else streamable_conv(p["shortcut"], x,
                                                         causal=causal)
    return skip + h


# ---------------------------------------------------------------------------
# LSTM (skip-connected, reference StreamableLSTM)
# ---------------------------------------------------------------------------

def lstm_init(key, dim: int, num_layers: int, *, dtype=jnp.float32) -> list:
    layers = []
    for k in jax.random.split(key, max(num_layers, 1))[:num_layers]:
        k1, k2 = jax.random.split(k)
        layers.append({
            "wx": linear_init(k1, dim, 4 * dim, dtype=dtype),
            "wh": linear_init(k2, dim, 4 * dim, bias=False, dtype=dtype),
        })
    return layers


def lstm_forward(layers: list, x: jax.Array) -> jax.Array:
    """Multi-layer LSTM over (B, T, C) with skip connection (y + x)."""
    if not layers:
        return x
    y = x
    for p in layers:
        B, T, C = y.shape
        xs = linear(p["wx"], y)  # (B, T, 4C)

        def step(carry, x_t):
            h, c = carry
            gates = x_t + linear(p["wh"], h)
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((B, C), y.dtype), jnp.zeros((B, C), y.dtype))
        _, hs = jax.lax.scan(step, init, xs.swapaxes(0, 1))
        y = hs.swapaxes(0, 1)
    return y + x


# ---------------------------------------------------------------------------
# full SEANet post-filter (encoder -> bottleneck -> decoder)
# ---------------------------------------------------------------------------

class SeanetConfig(NamedTuple):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: Sequence[int] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    causal: bool = False
    compress: int = 2
    true_skip: bool = True
    lstm: int = 2
    trim_right_ratio: float = 1.0


def seanet_init(key: jax.Array, cfg: SeanetConfig, *, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))
    mult = 1
    nf = cfg.n_filters
    p: dict = {"enc_in": conv1d_init(next(ks), cfg.channels, nf, cfg.kernel_size,
                                     dtype=dtype),
               "enc_blocks": [], "dec_blocks": []}
    for ratio in reversed(list(cfg.ratios)):
        p["enc_blocks"].append({
            "res": resnet_block_init(next(ks), mult * nf,
                                     (cfg.residual_kernel_size, 1),
                                     compress=cfg.compress,
                                     true_skip=cfg.true_skip, dtype=dtype),
            "down": conv1d_init(next(ks), mult * nf, mult * nf * 2, ratio * 2,
                                dtype=dtype),
        })
        mult *= 2
    p["enc_lstm"] = lstm_init(next(ks), mult * nf, cfg.lstm, dtype=dtype)
    p["enc_out"] = conv1d_init(next(ks), mult * nf, cfg.dimension,
                               cfg.last_kernel_size, dtype=dtype)
    p["dec_in"] = conv1d_init(next(ks), cfg.dimension, mult * nf, cfg.kernel_size,
                              dtype=dtype)
    p["dec_lstm"] = lstm_init(next(ks), mult * nf, cfg.lstm, dtype=dtype)
    for ratio in cfg.ratios:
        p["dec_blocks"].append({
            "up": conv_transpose1d_init(next(ks), mult * nf, mult * nf // 2,
                                        ratio * 2, dtype=dtype),
            "res": resnet_block_init(next(ks), mult * nf // 2,
                                     (cfg.residual_kernel_size, 1),
                                     compress=cfg.compress,
                                     true_skip=cfg.true_skip, dtype=dtype),
        })
        mult //= 2
    p["dec_out"] = conv1d_init(next(ks), nf, cfg.channels, cfg.last_kernel_size,
                               dtype=dtype)
    return p


def seanet_forward(p: dict, x: jax.Array, cfg: SeanetConfig) -> jax.Array:
    """(B, T, 1) waveform -> (B, ~T, 1) refined waveform.

    The first stream conv carries a Tanh pre-activation in the reference
    (generator/vocoder.py:222-233 passes activation=Tanh(); StreamableConv1d
    applies it BEFORE the conv, streamable.py:260-262)."""
    h = streamable_conv(p["enc_in"], jnp.tanh(x), causal=cfg.causal)
    for blk, ratio in zip(p["enc_blocks"], reversed(list(cfg.ratios))):
        h = resnet_block(blk["res"], h, causal=cfg.causal)
        h = _elu(h)
        h = streamable_conv(blk["down"], h, stride=ratio, causal=cfg.causal)
    h = lstm_forward(p["enc_lstm"], h)
    h = _elu(h)
    h = streamable_conv(p["enc_out"], h, causal=cfg.causal)
    h = streamable_conv(p["dec_in"], h, causal=cfg.causal)
    h = lstm_forward(p["dec_lstm"], h)
    for blk, ratio in zip(p["dec_blocks"], cfg.ratios):
        h = _elu(h)
        h = streamable_conv_transpose(blk["up"], h, stride=ratio,
                                      causal=cfg.causal,
                                      trim_right_ratio=cfg.trim_right_ratio)
        h = resnet_block(blk["res"], h, causal=cfg.causal)
    h = _elu(h)
    return streamable_conv(p["dec_out"], h, causal=cfg.causal)
