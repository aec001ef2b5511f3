"""HiFi-GAN generator (reference models/vocoder/hifigan.py:37-205).

conv_pre(k7) -> N x [leaky_relu -> ConvTranspose upsample -> mean of resblocks
(k in {3,7,11}, dilations (1,3,5))] -> leaky_relu -> conv_post(k7) -> tanh.

weight_norm g/v factors are folded into plain conv weights at checkpoint-load time
(SURVEY.md §7 hard-parts). All convs run in NWC layout on the MXU; the transposed
convs use lhs-dilation so the whole stack compiles to one fused XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, conv_transpose1d, conv_transpose1d_init,
)


class HifiGanConfig(NamedTuple):
    model_in_dim: int = 1792          # unit 1280 + lang 256 + spkr 256
    upsample_initial_channel: int = 512
    upsample_rates: Sequence[int] = (5, 4, 4, 2, 2)      # 320x total
    upsample_kernel_sizes: Sequence[int] = (11, 8, 8, 4, 4)
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    leaky_relu_slope: float = 0.1
    # PRETSSEL variant (reference generator/vocoder.py:407-421,552-556): the
    # upsampler uses padding=(k-u)//2 + u%2 with output_padding=u%2, and the
    # conv_post output is returned raw (the tanh is applied by the caller on
    # the skip path only).
    add_ups_out_pad: bool = False
    final_tanh: bool = True

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


def _resblock_init(key, channels, kernel, dilations, dtype):
    ks = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [conv1d_init(ks[2 * i], channels, channels, kernel, dtype=dtype)
                   for i in range(len(dilations))],
        "convs2": [conv1d_init(ks[2 * i + 1], channels, channels, kernel, dtype=dtype)
                   for i in range(len(dilations))],
    }


def hifigan_init(key: jax.Array, cfg: HifiGanConfig, *, dtype=jnp.float32) -> dict:
    n_up = len(cfg.upsample_rates)
    ks = jax.random.split(key, 2 + n_up + n_up * len(cfg.resblock_kernel_sizes))
    params = {
        "conv_pre": conv1d_init(ks[0], cfg.model_in_dim, cfg.upsample_initial_channel,
                                7, dtype=dtype),
        "upsampler": [],
        "resblocks": [],
    }
    ki = 2
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        in_ch = cfg.upsample_initial_channel // (2 ** i)
        out_ch = cfg.upsample_initial_channel // (2 ** (i + 1))
        params["upsampler"].append(
            conv_transpose1d_init(ks[ki], in_ch, out_ch, k, dtype=dtype))
        ki += 1
        for kernel, dils in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            params["resblocks"].append(_resblock_init(ks[ki], out_ch, kernel, dils, dtype))
            ki += 1
    last_ch = cfg.upsample_initial_channel // (2 ** n_up)
    params["conv_post"] = conv1d_init(ks[1], last_ch, 1, 7, dtype=dtype)
    return params


def _resblock(p: dict, x: jax.Array, dilations: Sequence[int], slope: float) -> jax.Array:
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        h = jax.nn.leaky_relu(x, slope)
        h = conv1d(c1, h, padding="SAME", dilation=d)
        h = jax.nn.leaky_relu(h, slope)
        h = conv1d(c2, h, padding="SAME", dilation=1)
        x = x + h
    return x


def hifigan_forward(params: dict, x: jax.Array, cfg: HifiGanConfig) -> jax.Array:
    """(B, T, model_in_dim) -> (B, T * total_upsample) waveform in [-1, 1]."""
    h = conv1d(params["conv_pre"], x, padding="SAME")
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        h = jax.nn.leaky_relu(h, cfg.leaky_relu_slope)
        out_pad = rate % 2 if cfg.add_ups_out_pad else 0
        h = conv_transpose1d(params["upsampler"][i], h, stride=rate,
                             padding=(k - rate) // 2 + out_pad,
                             output_padding=out_pad)
        acc = None
        for j in range(nk):
            rb = params["resblocks"][i * nk + j]
            dils = cfg.resblock_dilation_sizes[j]
            r = _resblock(rb, h, dils, cfg.leaky_relu_slope)
            acc = r if acc is None else acc + r
        h = acc / nk
    h = jax.nn.leaky_relu(h, 0.01)   # torch default slope for the final activation
    h = conv1d(params["conv_post"], h, padding="SAME")
    if cfg.final_tanh:
        h = jnp.tanh(h)
    return h[..., 0]
