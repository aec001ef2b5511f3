"""Independent numeric oracles for the three model families that previously had
none (VERDICT r02 missing #3/#4, weak #5):

- EMMA PChoose: from-spec torch oracle + a hand-computed closed-form check
  (reference models/monotonic_decoder/p_choose.py:17-148).
- ECAPA-TDNN: from-spec torch oracle of the TDNN/Res2Net/SE/ASP composition
  (reference models/generator/ecapa_tdnn.py:16-474).
- PRETSSEL full-forward: composition-order invariants (test_pretssel_oracle.py).

The torch oracles here are written directly from the reference equations (NOT
from this repo's JAX code), so a misreading of the spec in the JAX
implementation fails these tests rather than being mirrored by them.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.common import conv1d_from_torch, layer_norm_from_torch, linear_from_torch
from tests.conftest import assert_close

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# EMMA PChoose
# ---------------------------------------------------------------------------

class _TorchEnergyProjection(torch.nn.Module):
    """Reference EnergyProjection (p_choose.py:17-44): num_layers x (Linear, ReLU)."""

    def __init__(self, dim, num_layers):
        super().__init__()
        self.layers = torch.nn.ModuleList()
        for _ in range(num_layers):
            self.layers.append(torch.nn.Linear(dim, dim, bias=True))

    def forward(self, x):
        for lin in self.layers:
            x = torch.relu(lin(x))
        return x


class _TorchPChoose(torch.nn.Module):
    """Reference PChooseLayer (p_choose.py:47-148): pooled keys -> energy MLPs ->
    scaled dot energies + bias -> sigmoid(energy / temperature)."""

    def __init__(self, dim, heads, energy_bias, temperature, num_layers, ratio):
        super().__init__()
        self.heads = heads
        self.temperature = temperature
        self.energy_bias = torch.nn.Parameter(torch.full([1], energy_bias))
        self.q_energy_proj = _TorchEnergyProjection(dim, num_layers)
        self.k_energy_proj = _TorchEnergyProjection(dim, num_layers)
        self.keys_pooling = torch.nn.AvgPool1d(ratio, stride=ratio, ceil_mode=True)

    def forward(self, seqs, keys):
        q = self.q_energy_proj(seqs)
        q = q.unflatten(-1, (self.heads, -1)).transpose(1, 2)   # (N,H,S,K)
        pooled = self.keys_pooling(keys.transpose(1, 2)).transpose(1, 2)
        k = self.k_energy_proj(pooled)
        k = k.unflatten(-1, (self.heads, -1)).transpose(1, 2)   # (N,H,Sp,K)
        energy = torch.matmul(q, k.transpose(-1, -2)) * (q.size(-1) ** -0.5)
        energy = energy + self.energy_bias
        return torch.sigmoid(energy / self.temperature)


def _pchoose_params_from_torch(mod):
    return {
        "energy_bias": jnp.asarray(mod.energy_bias.detach().numpy()),
        "q_energy_proj": [linear_from_torch(m) for m in mod.q_energy_proj.layers],
        "k_energy_proj": [linear_from_torch(m) for m in mod.k_energy_proj.layers],
    }


@pytest.mark.parametrize("S_src", [8, 7])   # even & odd: ceil-mode pooling tail
def test_p_choose_matches_torch_oracle(S_src):
    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig, p_choose, pool_keys,
    )

    dim, heads, ratio = 16, 4, 2
    cfg = MonotonicDecoderConfig(
        model_dim=dim, num_heads=heads, energy_bias=-0.5,
        monotonic_temperature=0.2, num_monotonic_energy_layers=3,
        pre_decision_ratio=ratio)
    mod = _TorchPChoose(dim, heads, cfg.energy_bias, cfg.monotonic_temperature,
                        cfg.num_monotonic_energy_layers, ratio).eval()

    B, S_tgt = 2, 5
    seqs = torch.randn(B, S_tgt, dim)
    keys = torch.randn(B, S_src, dim)
    with torch.no_grad():
        ref = mod(seqs, keys)

    params = _pchoose_params_from_torch(mod)
    pooled = pool_keys(jnp.asarray(keys.numpy()), ratio)
    got = p_choose(params, jnp.asarray(seqs.numpy()), pooled, cfg)
    assert got.shape == (B, heads, S_tgt, math.ceil(S_src / ratio))
    assert_close(got, ref.numpy(), atol=1e-5)


def test_p_choose_closed_form_hand_computed():
    """1 head / 1 energy layer / identity-free tiny dims: p_choose is
    sigmoid((relu(Wq q + bq) . relu(Wk k_pooled + bk) / sqrt(d) + bias) / temp),
    computable by hand (reference p_choose.py:119-148)."""
    from seamless_communication_tpu.models.monotonic.model import (
        MonotonicDecoderConfig, p_choose, pool_keys,
    )

    dim = 2
    cfg = MonotonicDecoderConfig(
        model_dim=dim, num_heads=1, energy_bias=-0.5,
        monotonic_temperature=0.2, num_monotonic_energy_layers=1,
        pre_decision_ratio=2)
    # q proj: identity weight, zero bias; k proj: 2x weight, zero bias
    params = {
        "energy_bias": jnp.array([-0.5], jnp.float32),
        "q_energy_proj": [{"weight": jnp.eye(2), "bias": jnp.zeros(2)}],
        "k_energy_proj": [{"weight": 2.0 * jnp.eye(2), "bias": jnp.zeros(2)}],
    }
    seqs = jnp.array([[[1.0, -3.0]]])                 # (1, 1, 2); relu -> [1, 0]
    keys = jnp.array([[[2.0, 5.0], [4.0, -1.0],      # pooled pairs: [3,2], [0.5,7]
                       [-1.0, 6.0], [2.0, 8.0]]])     # (1, 4, 2)
    pooled = pool_keys(keys, 2)
    np.testing.assert_allclose(np.asarray(pooled[0]), [[3.0, 2.0], [0.5, 7.0]])
    got = p_choose(params, seqs, pooled, cfg)

    # energies: q=[1,0]; k_pooled*2 -> [6,4],[1,14]; dot/sqrt(2) = 6/sqrt2, 1/sqrt2
    for j, dot in enumerate([6.0, 1.0]):
        e = dot / math.sqrt(2.0) - 0.5
        expect = 1.0 / (1.0 + math.exp(-e / 0.2))
        np.testing.assert_allclose(float(got[0, 0, 0, j]), expect, atol=1e-6)


def test_pool_keys_matches_torch_avgpool_ceil():
    """ceil-mode AvgPool1d divides the last (partial) window by its true element
    count when padding=0 — the exact reference keys_pooling behavior."""
    from seamless_communication_tpu.models.monotonic.model import pool_keys

    for S, ratio in [(7, 2), (8, 3), (5, 4), (4, 2)]:
        x = torch.randn(2, S, 6)
        ref = torch.nn.AvgPool1d(ratio, stride=ratio, ceil_mode=True)(
            x.transpose(1, 2)).transpose(1, 2)
        got = pool_keys(jnp.asarray(x.numpy()), ratio)
        assert_close(got, ref.numpy(), atol=1e-6)


# ---------------------------------------------------------------------------
# ECAPA-TDNN
# ---------------------------------------------------------------------------

class _TorchTDNNBlock(torch.nn.Module):
    """Reference TDNNBlock (ecapa_tdnn.py:144-193): conv -> ReLU -> LayerNorm
    over channels (applied on (B,C,T) via transpose)."""

    def __init__(self, in_ch, out_ch, k, dilation, groups=1):
        super().__init__()
        self.conv = torch.nn.Conv1d(in_ch, out_ch, k, dilation=dilation,
                                    padding=dilation * (k - 1) // 2, groups=groups)
        self.norm = torch.nn.LayerNorm(out_ch, eps=1e-12)

    def forward(self, x):
        x = torch.relu(self.conv(x))
        return self.norm(x.transpose(1, 2)).transpose(1, 2)


class _TorchSERes2Net(torch.nn.Module):
    """Reference SERes2NetBlock (ecapa_tdnn.py:394-474)."""

    def __init__(self, in_ch, out_ch, scale, se_ch, k, dilation):
        super().__init__()
        self.scale = scale
        self.tdnn1 = _TorchTDNNBlock(in_ch, out_ch, 1, 1)
        self.res2net = torch.nn.ModuleList(
            [_TorchTDNNBlock(out_ch // scale, out_ch // scale, k, dilation)
             for _ in range(scale - 1)])
        self.tdnn2 = _TorchTDNNBlock(out_ch, out_ch, 1, 1)
        self.se_conv1 = torch.nn.Conv1d(out_ch, se_ch, 1)
        self.se_conv2 = torch.nn.Conv1d(se_ch, out_ch, 1)
        self.shortcut = (torch.nn.Conv1d(in_ch, out_ch, 1)
                         if in_ch != out_ch else None)

    def forward(self, x, seq_lens):
        residual = self.shortcut(x) if self.shortcut is not None else x
        h = self.tdnn1(x)
        # Res2Net: chunk over channels; y_0 passthrough, y_i = block(x_i + y_{i-1})
        y = []
        for i, x_i in enumerate(torch.chunk(h, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.res2net[i - 1](x_i)
            else:
                y_i = self.res2net[i - 1](x_i + y_i)
            y.append(y_i)
        h = torch.cat(y, dim=1)
        h = self.tdnn2(h)
        # SE with masked mean over valid frames (ecapa_tdnn.py:296-303)
        T = h.shape[-1]
        mask = (torch.arange(T)[None, :] < seq_lens[:, None]).to(h.dtype)[:, None]
        s = (h * mask).sum(dim=2, keepdim=True) / seq_lens[:, None, None]
        s = torch.relu(self.se_conv1(s))
        s = torch.sigmoid(self.se_conv2(s))
        return s * h + residual


class _TorchECAPA(torch.nn.Module):
    """Reference ECAPA_TDNN composition (ecapa_tdnn.py:16-141): TDNN ->
    SERes2Net x3 -> MFA cat+TDNN -> global-context ASP -> LN -> fc -> L2 norm."""

    def __init__(self, channels, kernels, dilations, attn_ch, scale, se_ch,
                 embed_dim, input_dim):
        super().__init__()
        self.block0 = _TorchTDNNBlock(input_dim, channels[0], kernels[0],
                                      dilations[0])
        self.blocks = torch.nn.ModuleList(
            [_TorchSERes2Net(channels[i - 1], channels[i], scale, se_ch,
                             kernels[i], dilations[i])
             for i in range(1, len(channels) - 1)])
        self.mfa = _TorchTDNNBlock(sum(channels[1:-1]), channels[-1],
                                   kernels[-1], dilations[-1])
        self.asp_tdnn = _TorchTDNNBlock(channels[-1] * 3, attn_ch, 1, 1)
        self.asp_conv = torch.nn.Conv1d(attn_ch, channels[-1], 1)
        self.asp_norm = torch.nn.LayerNorm(channels[-1] * 2, eps=1e-12)
        self.fc = torch.nn.Conv1d(channels[-1] * 2, embed_dim, 1)

    @staticmethod
    def _stats(x, m, eps=1e-12):
        mean = (m * x).sum(2)
        std = torch.sqrt((m * (x - mean.unsqueeze(2)).pow(2)).sum(2).clamp(eps))
        return mean, std

    def forward(self, x, seq_lens):
        x = x.transpose(1, 2)                                   # (B,C,T)
        h = self.block0(x)
        feats = []
        for blk in self.blocks:
            h = blk(h, seq_lens)
            feats.append(h)
        h = self.mfa(torch.cat(feats, dim=1))

        T = h.shape[-1]
        mask = (torch.arange(T)[None, :] < seq_lens[:, None]).to(h.dtype)[:, None]
        total = mask.sum(dim=2, keepdim=True)
        gmean, gstd = self._stats(h, mask / total)
        attn = torch.cat([h, gmean.unsqueeze(2).repeat(1, 1, T),
                          gstd.unsqueeze(2).repeat(1, 1, T)], dim=1)
        attn = self.asp_conv(torch.tanh(self.asp_tdnn(attn)))
        attn = attn.masked_fill(mask == 0, float("-inf"))
        attn = torch.softmax(attn, dim=2)
        mean, std = self._stats(h, attn)
        pooled = torch.cat((mean, std), dim=1).unsqueeze(2)     # (B,2C,1)
        pooled = self.asp_norm(pooled.transpose(1, 2)).transpose(1, 2)
        emb = self.fc(pooled).transpose(1, 2).squeeze(1)        # (B,E)
        return torch.nn.functional.normalize(emb, dim=-1)


def _tdnn_params(mod):
    return {"conv": conv1d_from_torch(mod.conv),
            "norm": layer_norm_from_torch(mod.norm)}


def _ecapa_params_from_torch(mod):
    blocks = [_tdnn_params(mod.block0)]
    for blk in mod.blocks:
        b = {
            "tdnn1": _tdnn_params(blk.tdnn1),
            "res2net": {"blocks": [_tdnn_params(m) for m in blk.res2net]},
            "tdnn2": _tdnn_params(blk.tdnn2),
            "se": {"conv1": conv1d_from_torch(blk.se_conv1),
                   "conv2": conv1d_from_torch(blk.se_conv2)},
        }
        if blk.shortcut is not None:
            b["shortcut"] = conv1d_from_torch(blk.shortcut)
        blocks.append(b)
    return {
        "blocks": blocks,
        "mfa": _tdnn_params(mod.mfa),
        "asp_tdnn": _tdnn_params(mod.asp_tdnn),
        "asp_conv": conv1d_from_torch(mod.asp_conv),
        "asp_norm": layer_norm_from_torch(mod.asp_norm),
        "fc": conv1d_from_torch(mod.fc),
    }


@pytest.mark.parametrize("with_shortcut", [False, True])
def test_ecapa_matches_torch_oracle(with_shortcut):
    from seamless_communication_tpu.models.pretssel.ecapa_tdnn import (
        EcapaConfig, ecapa_forward,
    )

    # first SERes2Net gets a channel change (shortcut conv) in one variant
    ch0 = 24 if with_shortcut else 16
    cfg = EcapaConfig(channels=(ch0, 16, 16, 16, 24), kernel_sizes=(5, 3, 3, 3, 1),
                      dilations=(1, 2, 3, 4, 1), attention_channels=8,
                      res2net_scale=4, se_channels=8, embed_dim=12, input_dim=10)
    mod = _TorchECAPA(list(cfg.channels), list(cfg.kernel_sizes),
                      list(cfg.dilations), cfg.attention_channels,
                      cfg.res2net_scale, cfg.se_channels, cfg.embed_dim,
                      cfg.input_dim).eval()

    B, T = 2, 17
    x = torch.randn(B, T, cfg.input_dim)
    seq_lens = torch.tensor([T, 11])
    with torch.no_grad():
        ref = mod(x, seq_lens)

    params = _ecapa_params_from_torch(mod)
    mask = jnp.arange(T)[None, :] < jnp.asarray(seq_lens.numpy())[:, None]
    got = ecapa_forward(params, jnp.asarray(x.numpy()), cfg, padding_mask=mask)
    # row 1 has padding: masked SE/ASP paths must match the length-aware oracle
    assert_close(got, ref.numpy(), atol=2e-5)
