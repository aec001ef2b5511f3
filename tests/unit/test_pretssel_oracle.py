"""PRETSSEL full wave-synthesis oracle (VERDICT r02 weak #5): a from-spec torch
implementation of the composed post-mel pipeline the reference interleaves
through its flat layer list (generator/vocoder.py:358-453 construction,
476-573 forward):

  postnet (Conv+BN+Tanh, residual) -> gcmvn DEnormalize -> (x - mean)/scale
  -> HiFi-GAN (conv_pre/ups+resblocks/conv_post, no final tanh) = skip
  -> SEANet post-filter (EnCodec pads, tanh pre-activation on the first conv)
  -> 0.8 * seanet(skip) + tanh(skip)

The torch modules below are written from the reference equations (NOT from the
JAX code) so composition-order or padding misreads fail here. Any perturbation
of the order (gcmvn before postnet, mix weights swapped, missing tanh) changes
the output and is caught by the comparison.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tests.common import batch_norm_fold, conv1d_from_torch, t2j
from tests.conftest import assert_close

torch.manual_seed(1)


# ---------------------------------------------------------------------------
# torch building blocks (from-spec)
# ---------------------------------------------------------------------------

class _StreamConv(torch.nn.Module):
    """Reference StreamableConv1d, non-causal, pad_mode=constant
    (streamable.py:260-284): total = k_eff - stride; right = total // 2;
    left = total - right; extra right pad fills the last window."""

    def __init__(self, in_ch, out_ch, k, stride=1, dilation=1, tanh_pre=False):
        super().__init__()
        self.conv = torch.nn.Conv1d(in_ch, out_ch, k, stride, dilation=dilation)
        self.stride = stride
        self.k_eff = (k - 1) * dilation + 1
        self.tanh_pre = tanh_pre

    def forward(self, x):
        if self.tanh_pre:
            x = torch.tanh(x)
        T = x.shape[-1]
        total = self.k_eff - self.stride
        n_frames = (T - self.k_eff + total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + (self.k_eff - total)
        extra = ideal - T
        right = total // 2
        x = F.pad(x, (total - right, right + extra))
        return self.conv(x)


class _StreamConvTr(torch.nn.Module):
    """Reference StreamableConvTranspose1d non-causal (streamable.py:325-349)."""

    def __init__(self, in_ch, out_ch, k, stride):
        super().__init__()
        self.convtr = torch.nn.ConvTranspose1d(in_ch, out_ch, k, stride)
        self.k, self.stride = k, stride

    def forward(self, x):
        y = self.convtr(x)
        total = self.k - self.stride
        right = total // 2
        left = total - right
        return y[..., left:y.shape[-1] - right]


class _StreamResBlock(torch.nn.Module):
    """Reference StreamableResnetBlock: ELU->conv(k)->ELU->conv(1), true skip."""

    def __init__(self, dim, k, compress=2):
        super().__init__()
        self.c1 = _StreamConv(dim, dim // compress, k)
        self.c2 = _StreamConv(dim // compress, dim, 1)

    def forward(self, x):
        h = self.c2(F.elu(self.c1(F.elu(x))))
        return x + h


class _SkipLSTM(torch.nn.Module):
    def __init__(self, dim, layers):
        super().__init__()
        self.lstm = torch.nn.LSTM(dim, dim, layers)

    def forward(self, x):  # (B, C, T)
        y = x.permute(2, 0, 1)
        y, _ = self.lstm(y)
        return y.permute(1, 2, 0) + x


class _TorchSeanet(torch.nn.Module):
    """Reference SEANet post-filter layer sequence (vocoder.py:222-344):
    tanh-pre in conv -> [res, ELU, down]xN -> LSTM -> ELU -> out conv ->
    in conv -> LSTM -> [ELU, up, res]xN -> ELU -> final conv."""

    def __init__(self, dim, n_filters, ratios, k, last_k, res_k, lstm):
        super().__init__()
        mult = 1
        self.enc_in = _StreamConv(1, n_filters, k, tanh_pre=True)
        self.enc = torch.nn.ModuleList()
        for r in reversed(ratios):
            self.enc.append(torch.nn.ModuleList([
                _StreamResBlock(mult * n_filters, res_k),
                _StreamConv(mult * n_filters, mult * n_filters * 2, r * 2, r)]))
            mult *= 2
        self.enc_lstm = _SkipLSTM(mult * n_filters, lstm)
        self.enc_out = _StreamConv(mult * n_filters, dim, last_k)
        self.dec_in = _StreamConv(dim, mult * n_filters, k)
        self.dec_lstm = _SkipLSTM(mult * n_filters, lstm)
        self.dec = torch.nn.ModuleList()
        for r in ratios:
            self.dec.append(torch.nn.ModuleList([
                _StreamConvTr(mult * n_filters, mult * n_filters // 2, r * 2, r),
                _StreamResBlock(mult * n_filters // 2, res_k)]))
            mult //= 2
        self.dec_out = _StreamConv(n_filters, 1, last_k)

    def forward(self, x):  # (B, 1, T)
        h = self.enc_in(x)
        for res, down in self.enc:
            h = down(F.elu(res(h)))
        h = self.enc_lstm(h)
        h = self.enc_out(F.elu(h))
        h = self.dec_in(h)
        h = self.dec_lstm(h)
        for up, res in self.dec:
            h = res(up(F.elu(h)))
        return self.dec_out(F.elu(h))


class _TorchPretsselWave(torch.nn.Module):
    """Post-mel PRETSSEL composition (vocoder.py:476-573, B=1)."""

    def __init__(self, mel_dim, pn_ch, pn_layers, pn_k, ups, up_ks, init_ch,
                 res_ks, res_dils, seanet):
        super().__init__()
        self.pn = torch.nn.ModuleList()
        ch_in = mel_dim
        for i in range(pn_layers):
            ch_out = pn_ch if i < pn_layers - 1 else mel_dim
            self.pn.append(torch.nn.ModuleList([
                torch.nn.Conv1d(ch_in, ch_out, pn_k, padding="same"),
                torch.nn.BatchNorm1d(ch_out)]))
            ch_in = ch_out
        self.pn_layers = pn_layers
        self.conv_pre = torch.nn.Conv1d(mel_dim, init_ch, 7, 1, padding="same")
        self.ups = torch.nn.ModuleList()
        for i, (u, k) in enumerate(zip(ups, up_ks)):
            out_pad = u % 2
            self.ups.append(torch.nn.ConvTranspose1d(
                init_ch // (2 ** i), init_ch // (2 ** (i + 1)), k, u,
                padding=(k - u) // 2 + out_pad, output_padding=out_pad))
        self.resblocks = torch.nn.ModuleList()
        for i in range(len(ups)):
            ch = init_ch // (2 ** (i + 1))
            for k, dils in zip(res_ks, res_dils):
                convs1 = torch.nn.ModuleList(
                    [torch.nn.Conv1d(ch, ch, k, 1, dilation=d,
                                     padding=(k * d - d) // 2) for d in dils])
                convs2 = torch.nn.ModuleList(
                    [torch.nn.Conv1d(ch, ch, k, 1, padding=(k - 1) // 2)
                     for _ in dils])
                self.resblocks.append(torch.nn.ModuleList([convs1, convs2]))
        self.num_kernels = len(res_ks)
        self.conv_post = torch.nn.Conv1d(ch, 1, 7, 1, padding=3)
        self.seanet = seanet
        self.register_buffer("gcmvn_mean", torch.randn(mel_dim))
        self.register_buffer("gcmvn_std", torch.rand(mel_dim) + 0.5)
        self.register_buffer("mean", torch.randn(mel_dim))
        self.register_buffer("scale", torch.rand(mel_dim) + 0.5)

    def forward(self, mel):  # (1, T, mel_dim), full length (no padding)
        pn = mel.transpose(1, 2)
        for i, (conv, bn) in enumerate(self.pn):
            pn = bn(conv(pn))
            if i < self.pn_layers - 1:
                pn = torch.tanh(pn)
        x = mel + pn.transpose(1, 2)
        x = x * self.gcmvn_std + self.gcmvn_mean           # gcmvn DEnormalize
        x = (x - self.mean) / self.scale                   # normalize_before
        x = x.transpose(1, 2)                              # (1, C, T)
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = F.leaky_relu(x, 0.1)
            x = up(x)
            xs = None
            for j in range(self.num_kernels):
                convs1, convs2 = self.resblocks[i * self.num_kernels + j]
                h = x
                for c1, c2 in zip(convs1, convs2):
                    ht = c1(F.leaky_relu(h, 0.1))
                    ht = c2(F.leaky_relu(ht, 0.1))
                    h = ht + h
                xs = h if xs is None else xs + h
            x = xs / self.num_kernels
        x = F.leaky_relu(x)                                # torch default slope
        skip = self.conv_post(x)
        h = self.seanet(skip)
        h = h[..., :skip.shape[-1]]
        return 0.8 * h + torch.tanh(skip)                  # (1, 1, T_wav)


# ---------------------------------------------------------------------------
# weight transplant: torch oracle -> JAX param tree
# ---------------------------------------------------------------------------

def _sc(mod):  # _StreamConv -> conv1d params
    return conv1d_from_torch(mod.conv)


def _sct(mod):  # _StreamConvTr -> conv_transpose1d params (k, in, out)
    return {"weight": t2j(mod.convtr.weight.permute(2, 0, 1)),
            "bias": t2j(mod.convtr.bias)}


def _res(mod):
    return {"conv1": _sc(mod.c1), "conv2": _sc(mod.c2)}


def _lstm(mod):
    tree = []
    for k in range(mod.lstm.num_layers):
        tree.append({
            "wx": {"weight": t2j(getattr(mod.lstm, f"weight_ih_l{k}").T),
                   "bias": t2j(getattr(mod.lstm, f"bias_ih_l{k}")
                               + getattr(mod.lstm, f"bias_hh_l{k}"))},
            "wh": {"weight": t2j(getattr(mod.lstm, f"weight_hh_l{k}").T)},
        })
    return tree


def _seanet_params(mod):
    return {
        "enc_in": _sc(mod.enc_in),
        "enc_blocks": [{"res": _res(res), "down": _sc(down)}
                       for res, down in mod.enc],
        "enc_lstm": _lstm(mod.enc_lstm),
        "enc_out": _sc(mod.enc_out),
        "dec_in": _sc(mod.dec_in),
        "dec_lstm": _lstm(mod.dec_lstm),
        "dec_blocks": [{"up": _sct(up), "res": _res(res)}
                       for up, res in mod.dec],
        "dec_out": _sc(mod.dec_out),
    }


def _bn_affine(bn):
    sd = {"n.weight": bn.weight.detach().numpy(),
          "n.bias": bn.bias.detach().numpy(),
          "n.running_mean": bn.running_mean.numpy(),
          "n.running_var": bn.running_var.numpy()}
    return batch_norm_fold(bn)


def test_pretssel_wave_synth_matches_torch_oracle():
    from seamless_communication_tpu.models.pretssel.streamable import SeanetConfig
    from seamless_communication_tpu.models.pretssel.vocoder import (
        PretsselConfig, pretssel_wave_synth,
    )
    from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig

    MEL, T = 6, 24
    # ratio 5 exercises the odd-total asymmetric EnCodec padding (left-heavy)
    ratios, ups = (5, 2), (5, 2)
    seanet_t = _TorchSeanet(dim=8, n_filters=2, ratios=list(ratios), k=7,
                            last_k=7, res_k=3, lstm=1)
    mod = _TorchPretsselWave(
        MEL, pn_ch=8, pn_layers=3, pn_k=5, ups=list(ups),
        up_ks=[10, 4], init_ch=16, res_ks=[3, 5], res_dils=[[1, 3], [1, 2]],
        seanet=seanet_t).eval()
    # non-trivial BN statistics so a missed fold shows up
    for _, bn in mod.pn:
        with torch.no_grad():
            bn.running_mean.copy_(torch.randn(bn.num_features) * 0.3)
            bn.running_var.copy_(torch.rand(bn.num_features) + 0.5)
            bn.weight.copy_(torch.randn(bn.num_features) * 0.5 + 1.0)
            bn.bias.copy_(torch.randn(bn.num_features) * 0.2)

    mel = torch.randn(1, T, MEL)
    with torch.no_grad():
        ref = mod(mel)[0, 0]

    cfg = PretsselConfig(
        mel_dim=MEL, pn_conv_dim=8, pn_layers=3, pn_kernel_size=5,
        hifigan=HifiGanConfig(model_in_dim=MEL, upsample_rates=ups,
                              upsample_kernel_sizes=(10, 4),
                              upsample_initial_channel=16,
                              resblock_kernel_sizes=(3, 5),
                              resblock_dilation_sizes=((1, 3), (1, 2)),
                              add_ups_out_pad=True, final_tanh=False),
        seanet=SeanetConfig(dimension=8, n_filters=2, ratios=ratios, lstm=1))

    params = {
        "postnet": [{"conv": conv1d_from_torch(conv), "norm": batch_norm_fold(bn)}
                    for conv, bn in mod.pn],
        "hifigan": {
            "conv_pre": conv1d_from_torch(mod.conv_pre),
            "upsampler": [{"weight": t2j(u.weight.permute(2, 0, 1)),
                           "bias": t2j(u.bias)} for u in mod.ups],
            "resblocks": [{"convs1": [conv1d_from_torch(c) for c in c1s],
                           "convs2": [conv1d_from_torch(c) for c in c2s]}
                          for c1s, c2s in mod.resblocks],
            "conv_post": conv1d_from_torch(mod.conv_post),
        },
        "seanet": _seanet_params(mod.seanet),
        "gcmvn_mean": t2j(mod.gcmvn_mean),
        "gcmvn_std": t2j(mod.gcmvn_std),
        "mean": t2j(mod.mean),
        "scale": t2j(mod.scale),
    }

    mmask = jnp.ones((1, T), bool)   # full length: reference truncation no-op
    out_mel, wav = pretssel_wave_synth(params, cfg, t2j(mel), mmask)
    assert wav.shape[0] == 1 and wav.shape[1] == ref.shape[0]
    assert_close(wav[0], ref.numpy(), atol=5e-4, rtol=1e-3)

    # and the returned mel is the gcmvn-DEnormalized postnet-residual mel
    with torch.no_grad():
        pn = mel.transpose(1, 2)
        for i, (conv, bn) in enumerate(mod.pn):
            pn = bn(conv(pn))
            if i < mod.pn_layers - 1:
                pn = torch.tanh(pn)
        mel_ref = (mel + pn.transpose(1, 2)) * mod.gcmvn_std + mod.gcmvn_mean
    assert_close(out_mel, mel_ref.numpy(), atol=1e-4)
