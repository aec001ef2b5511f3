"""ECAPA-TDNN prosody/speaker embedding network
(reference models/generator/ecapa_tdnn.py:16-474; arch config
ecapa_tdnn_builder.py:38-47: channels [512x4, 1536], kernels [5,3,3,3,1],
dilations [1,2,3,4,1], attention 128, res2net scale 8, SE 128, global context,
embed 512, input 80-mel).

Structure: TDNN block -> 3x SE-Res2Net blocks -> MFA concat -> TDNN -> attentive
statistics pooling (mean||std) -> LN -> 1x1 conv to embed_dim -> L2 normalize.
Activations are (B, T, C); all convs SAME-padded NWC.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, layer_norm, layer_norm_init, linear, linear_init,
)


class EcapaConfig(NamedTuple):
    channels: Sequence[int] = (512, 512, 512, 512, 1536)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    groups: Sequence[int] = (1, 1, 1, 1, 1)
    embed_dim: int = 512
    input_dim: int = 80


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _tdnn_init(key, in_ch, out_ch, k, *, groups=1, dtype=jnp.float32):
    return {"conv": conv1d_init(key, in_ch, out_ch, k, groups=groups, dtype=dtype),
            "norm": layer_norm_init(out_ch, dtype=dtype)}


def _res2net_init(key, in_ch, out_ch, scale, k, dtype):
    ks = jax.random.split(key, scale - 1)
    return {"blocks": [_tdnn_init(ks[i], in_ch // scale, out_ch // scale, k,
                                  dtype=dtype) for i in range(scale - 1)]}


def _se_init(key, in_ch, se_ch, out_ch, dtype):
    k1, k2 = jax.random.split(key)
    return {"conv1": conv1d_init(k1, in_ch, se_ch, 1, dtype=dtype),
            "conv2": conv1d_init(k2, se_ch, out_ch, 1, dtype=dtype)}


def ecapa_init(key: jax.Array, cfg: EcapaConfig, *, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8 + len(cfg.channels))
    blocks = [_tdnn_init(ks[0], cfg.input_dim, cfg.channels[0], cfg.kernel_sizes[0],
                         groups=cfg.groups[0], dtype=dtype)]
    for i in range(1, len(cfg.channels) - 1):
        k1, k2, k3, k4 = jax.random.split(ks[i], 4)
        b = {
            "tdnn1": _tdnn_init(k1, cfg.channels[i - 1], cfg.channels[i], 1, dtype=dtype),
            "res2net": _res2net_init(k2, cfg.channels[i], cfg.channels[i],
                                     cfg.res2net_scale, cfg.kernel_sizes[i], dtype),
            "tdnn2": _tdnn_init(k3, cfg.channels[i], cfg.channels[i], 1, dtype=dtype),
            "se": _se_init(k4, cfg.channels[i], cfg.se_channels, cfg.channels[i], dtype),
        }
        if cfg.channels[i - 1] != cfg.channels[i]:
            b["shortcut"] = conv1d_init(ks[i + 5], cfg.channels[i - 1],
                                        cfg.channels[i], 1, dtype=dtype)
        blocks.append(b)

    mfa_in = sum(cfg.channels[1:-1])
    asp_in = cfg.channels[-1] * (3 if cfg.global_context else 1)
    return {
        "blocks": blocks,
        "mfa": _tdnn_init(ks[-1], mfa_in, cfg.channels[-1], cfg.kernel_sizes[-1],
                          dtype=dtype),
        "asp_tdnn": _tdnn_init(ks[-2], asp_in, cfg.attention_channels, 1, dtype=dtype),
        "asp_conv": conv1d_init(ks[-3], cfg.attention_channels, cfg.channels[-1], 1,
                                dtype=dtype),
        "asp_norm": layer_norm_init(cfg.channels[-1] * 2, dtype=dtype),
        "fc": conv1d_init(ks[-4], cfg.channels[-1] * 2, cfg.embed_dim, 1, dtype=dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _tdnn(p, x, *, dilation=1, groups=1):
    h = jax.nn.relu(conv1d(p["conv"], x, padding="SAME", dilation=dilation,
                           groups=groups))
    return layer_norm(p["norm"], h, eps=1e-12)


def _res2net(p, x, scale, dilation):
    chunks = jnp.split(x, scale, axis=-1)
    y = [chunks[0]]
    y_i = None
    for i in range(1, scale):
        inp = chunks[i] if i == 1 else chunks[i] + y_i
        y_i = _tdnn(p["blocks"][i - 1], inp, dilation=dilation)
        y.append(y_i)
    return jnp.concatenate(y, axis=-1)


def _se(p, x, mask):
    if mask is not None:
        m = mask[..., None].astype(x.dtype)
        s = jnp.sum(x * m, axis=1, keepdims=True) / jnp.maximum(
            jnp.sum(m, axis=1, keepdims=True), 1.0)
    else:
        s = jnp.mean(x, axis=1, keepdims=True)
    s = jax.nn.relu(conv1d(p["conv1"], s, padding="SAME"))
    s = jax.nn.sigmoid(conv1d(p["conv2"], s, padding="SAME"))
    return s * x


def _stats(x, w, eps=1e-12):
    """weighted mean/std over time. x (B,T,C), w (B,T,1) normalized weights."""
    mean = jnp.sum(w * x, axis=1)
    var = jnp.sum(w * jnp.square(x - mean[:, None, :]), axis=1)
    return mean, jnp.sqrt(jnp.clip(var, eps, None))


def ecapa_forward(params: dict, x: jax.Array, cfg: EcapaConfig, *,
                  padding_mask: Optional[jax.Array] = None) -> jax.Array:
    """(B, T, input_dim) features -> (B, embed_dim) L2-normalized embedding."""
    feats = []
    h = _tdnn(params["blocks"][0], x, dilation=cfg.dilations[0], groups=cfg.groups[0])
    for i in range(1, len(cfg.channels) - 1):
        p = params["blocks"][i]
        residual = h if "shortcut" not in p else conv1d(p["shortcut"], h, padding="SAME")
        z = _tdnn(p["tdnn1"], h)
        z = _res2net(p["res2net"], z, cfg.res2net_scale, cfg.dilations[i])
        z = _tdnn(p["tdnn2"], z)
        z = _se(p["se"], z, padding_mask)
        h = z + residual
        feats.append(h)

    h = jnp.concatenate(feats, axis=-1)
    h = _tdnn(params["mfa"], h, dilation=cfg.dilations[-1])

    # attentive statistics pooling
    B, T, C = h.shape
    if padding_mask is not None:
        m = padding_mask[..., None].astype(h.dtype)
    else:
        m = jnp.ones((B, T, 1), h.dtype)
    total = jnp.sum(m, axis=1, keepdims=True)
    if cfg.global_context:
        gmean, gstd = _stats(h, m / total)
        attn_in = jnp.concatenate(
            [h, jnp.broadcast_to(gmean[:, None], h.shape),
             jnp.broadcast_to(gstd[:, None], h.shape)], axis=-1)
    else:
        attn_in = h
    a = _tdnn(params["asp_tdnn"], attn_in)
    a = conv1d(params["asp_conv"], jnp.tanh(a), padding="SAME")
    a = jnp.where(m > 0, a, -jnp.inf)
    w = jax.nn.softmax(a, axis=1)
    mean, std = _stats(h, w)
    pooled = jnp.concatenate([mean, std], axis=-1)[:, None, :]   # (B,1,2C)
    pooled = layer_norm(params["asp_norm"], pooled, eps=1e-12)
    emb = conv1d(params["fc"], pooled, padding="SAME")[:, 0]     # (B, embed)
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
