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


# ---------------------------------------------------------------------------
# PRE-MEL composed oracle (VERDICT r03 weak #8): from-spec torch modules for
# the reference's pre-mel chain (generator/vocoder.py:496-513 forward):
#   embed + alpha*sinpos -> FFT encoder (FiLM, POST norm order: NO final norm,
#   builder.py:304) -> variance adaptor (NO duration predictor; vuv-gated
#   pitch + energy 1x1-conv embeds added in PARALLEL, builder.py:392-403;
#   GAUSSIAN upsample by the PROVIDED durations, builder.py:149,
#   length_regulator.py:42-96) -> + alpha*sinpos -> FFT decoder (FiLM)
#   -> final_proj mel
# Written from the reference equations, not the JAX code.
# ---------------------------------------------------------------------------

class _TorchFiLM(torch.nn.Module):                 # models/unity/film.py:15-68
    def __init__(self, cond_dim, dim):
        super().__init__()
        self.proj = torch.nn.Linear(cond_dim, 2 * dim)
        self.s_gamma = torch.nn.Parameter(torch.randn(1) * 0.2 + 1.0)
        self.s_beta = torch.nn.Parameter(torch.randn(1) * 0.2 + 1.0)

    def forward(self, x, cond):
        gammas, betas = self.proj(cond).chunk(2, dim=-1)
        return (self.s_gamma * gammas + 1.0) * x + self.s_beta * betas


class _TorchVP(torch.nn.Module):            # length_regulator.py:99-220 (eval)
    def __init__(self, dim, hidden, k, cond_dim):
        super().__init__()
        self.conv1 = torch.nn.Conv1d(dim, hidden, k, padding="same")
        self.ln1 = torch.nn.LayerNorm(hidden)
        self.conv2 = torch.nn.Conv1d(hidden, hidden, k, padding="same")
        self.ln2 = torch.nn.LayerNorm(hidden)
        self.proj = torch.nn.Linear(hidden, 1)
        self.film = _TorchFiLM(cond_dim, hidden)

    def forward(self, x, cond):                 # (B, T, D) full length, (B,1,C)
        h = F.relu(self.conv1(x.transpose(1, 2))).transpose(1, 2)
        h = self.ln1(h)
        h = F.relu(self.conv2(h.transpose(1, 2))).transpose(1, 2)
        h = self.ln2(h)
        h = self.film(h, cond)
        return self.proj(h).squeeze(-1)


class _TorchFFTLayer(torch.nn.Module):          # fft_decoder_layer.py:104-230
    def __init__(self, dim, heads, ffn, k, cond_dim):
        super().__init__()
        self.heads = heads
        self.q = torch.nn.Linear(dim, dim)
        self.k = torch.nn.Linear(dim, dim)
        self.v = torch.nn.Linear(dim, dim)
        self.out = torch.nn.Linear(dim, dim)
        self.attn_ln = torch.nn.LayerNorm(dim)
        self.conv1 = torch.nn.Conv1d(dim, ffn, k, padding="same")
        self.conv2 = torch.nn.Conv1d(ffn, dim, k, padding="same")
        self.conv_ln = torch.nn.LayerNorm(dim)
        self.film = _TorchFiLM(cond_dim, dim)

    def forward(self, x, cond):
        B, T, D = x.shape
        H, Dh = self.heads, D // self.heads
        sh = lambda t: t.view(B, T, H, Dh).transpose(1, 2)
        a = F.scaled_dot_product_attention(sh(self.q(x)), sh(self.k(x)),
                                           sh(self.v(x)))
        a = self.out(a.transpose(1, 2).reshape(B, T, D))
        x = self.attn_ln(x + a)
        h = F.relu(self.conv1(x.transpose(1, 2)).transpose(1, 2))
        h = self.conv2(h.transpose(1, 2)).transpose(1, 2)
        x = self.conv_ln(x + h)
        return self.film(x, cond)


def _torch_sinpos(T, D, pad_idx):
    """fairseq sin|cos table with positions starting at pad_idx + 1."""
    half = D // 2
    inv = torch.exp(torch.arange(half, dtype=torch.float32)
                    * (-math.log(10000.0) / (half - 1)))
    pos = torch.arange(pad_idx + 1, pad_idx + 1 + T, dtype=torch.float32)
    ang = pos[:, None] * inv[None, :]
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=1)


def _torch_gaussian_upsample(x, durations, delta=0.1):
    # length_regulator.py:42-96, B=1 no padding: t 0-based, c = cumsum - d/2
    d = durations.float()
    c = torch.cumsum(d, dim=-1) - d / 2
    T_feat = int(d.sum())
    t = torch.arange(T_feat, dtype=torch.float32)[None]
    energy = -delta * (t.unsqueeze(-1) - c.unsqueeze(1)) ** 2
    p = F.softmax(energy, dim=2)
    return torch.matmul(p, x)


class _TorchPretsselPreMel(torch.nn.Module):
    def __init__(self, V, D, H, ffn, k, cond_dim, vp_hidden, vp_k, mel,
                 n_enc, n_dec):
        super().__init__()
        self.embed = torch.nn.Embedding(V, D)
        self.alpha_enc = torch.nn.Parameter(torch.tensor([1.3]))
        self.alpha_dec = torch.nn.Parameter(torch.tensor([0.7]))
        self.enc = torch.nn.ModuleList(
            [_TorchFFTLayer(D, H, ffn, k, cond_dim) for _ in range(n_enc)])
        self.pitch = _TorchVP(D, vp_hidden, vp_k, cond_dim)
        self.embed_pitch = torch.nn.Conv1d(1, D, 1)
        self.vuv = _TorchVP(D, vp_hidden, vp_k, cond_dim)
        self.energy = _TorchVP(D, vp_hidden, vp_k, cond_dim)
        self.embed_energy = torch.nn.Conv1d(1, D, 1)
        self.dec = torch.nn.ModuleList(
            [_TorchFFTLayer(D, H, ffn, k, cond_dim) for _ in range(n_dec)])
        self.final_proj = torch.nn.Linear(D, mel)
        self.pad_idx = 1

    def forward(self, units, durations, cond):
        x = self.embed(units)
        x = x + self.alpha_enc * _torch_sinpos(x.shape[1], x.shape[2],
                                               self.pad_idx)[None]
        for l in self.enc:
            x = l(x, cond)
        pitch = self.pitch(x, cond)
        pitch = pitch * (torch.sigmoid(self.vuv(x, cond)) >= 0.5)
        pe = self.embed_pitch(pitch.unsqueeze(1)).transpose(1, 2)
        ee = self.embed_energy(self.energy(x, cond).unsqueeze(1)).transpose(1, 2)
        x = x + pe + ee                       # add_variance_parallel=True
        x = _torch_gaussian_upsample(x, durations)
        x = x + self.alpha_dec * _torch_sinpos(x.shape[1], x.shape[2],
                                               self.pad_idx)[None]
        for l in self.dec:
            x = l(x, cond)
        return self.final_proj(x)


def _vp_tree(m):
    from tests.common import layer_norm_from_torch, linear_from_torch
    return {"conv1": conv1d_from_torch(m.conv1),
            "ln1": layer_norm_from_torch(m.ln1),
            "conv2": conv1d_from_torch(m.conv2),
            "ln2": layer_norm_from_torch(m.ln2),
            "proj": linear_from_torch(m.proj),
            "film": {"proj": linear_from_torch(m.film.proj),
                     "s_gamma": t2j(m.film.s_gamma),
                     "s_beta": t2j(m.film.s_beta)}}


def _fft_tree(l):
    from tests.common import layer_norm_from_torch, linear_from_torch
    return {"self_attn": {"q_proj": linear_from_torch(l.q),
                          "k_proj": linear_from_torch(l.k),
                          "v_proj": linear_from_torch(l.v),
                          "output_proj": linear_from_torch(l.out)},
            "self_attn_layer_norm": layer_norm_from_torch(l.attn_ln),
            "conv1": conv1d_from_torch(l.conv1),
            "conv2": conv1d_from_torch(l.conv2),
            "conv_layer_norm": layer_norm_from_torch(l.conv_ln),
            "film": {"proj": linear_from_torch(l.film.proj),
                     "s_gamma": t2j(l.film.s_gamma),
                     "s_beta": t2j(l.film.s_beta)}}


def test_pretssel_premel_matches_torch_oracle():
    from tests.common import embedding_from_torch, linear_from_torch
    from seamless_communication_tpu.models.pretssel.streamable import SeanetConfig
    from seamless_communication_tpu.models.pretssel.vocoder import (
        PretsselConfig, pretssel_premel,
    )
    from seamless_communication_tpu.models.vocoder.hifigan import HifiGanConfig

    V, D, H, FFN, K, COND, VPH, MEL = 20, 16, 2, 32, 3, 12, 8, 6
    mod = _TorchPretsselPreMel(V, D, H, FFN, K, COND, VPH, 3, MEL,
                               n_enc=2, n_dec=2).eval()
    # bias the vuv head so the >= 0.5 gate is exercised in BOTH directions
    with torch.no_grad():
        mod.vuv.proj.bias.fill_(0.0)
        mod.vuv.proj.weight.mul_(8.0)

    units = torch.randint(4, V, (1, 5))
    durations = torch.tensor([[2, 3, 1, 2, 0]])   # EOS-style trailing zero
    cond = torch.randn(1, 1, COND)
    with torch.no_grad():
        ref = mod(units, durations, cond)
    T_mel = int(durations.sum())

    cfg = PretsselConfig(
        num_units=V, model_dim=D, num_heads=H, ffn_inner_dim=FFN,
        conv_kernel_size=K, num_encoder_layers=2, num_decoder_layers=2,
        num_langs=2, lang_embed_dim=COND - 10, prosody_dim=10, mel_dim=MEL,
        var_pred_hidden=VPH, var_pred_kernel=3,
        hifigan=HifiGanConfig(model_in_dim=MEL),
        seanet=SeanetConfig())
    assert cfg.cond_dim == COND
    params = {
        "embed_tokens": embedding_from_torch(mod.embed),
        "pos_emb_alpha_enc": t2j(mod.alpha_enc),
        "pos_emb_alpha_dec": t2j(mod.alpha_dec),
        "encoder_layers": [_fft_tree(l) for l in mod.enc],
        "pitch_predictor": _vp_tree(mod.pitch),
        "embed_pitch": conv1d_from_torch(mod.embed_pitch),
        "vuv_predictor": _vp_tree(mod.vuv),
        "energy_predictor": _vp_tree(mod.energy),
        "embed_energy": conv1d_from_torch(mod.embed_energy),
        "decoder_layers": [_fft_tree(l) for l in mod.dec],
        "final_proj": linear_from_torch(mod.final_proj),
    }
    uj = jnp.asarray(units.numpy())
    dj = jnp.asarray(durations.numpy())
    cj = t2j(cond)
    ul = jnp.asarray([5], jnp.int32)
    mel, mel_total, _ = pretssel_premel(params, cfg, uj, ul, dj, cj,
                                        max_mel_len=T_mel)
    assert int(mel_total[0]) == T_mel
    assert_close(mel[0], ref[0].numpy(), atol=5e-4, rtol=1e-3)

    # order perturbations must fail: each variant below reproduces a plausible
    # misreading of the reference and must NOT match the oracle
    diff = lambda m: float(np.abs(np.asarray(m[0]) - ref[0].numpy()).max())

    from seamless_communication_tpu.ops.upsample import hard_upsample
    from seamless_communication_tpu.models.unity.t2u import (
        _alpha_sin_pos, fft_layer, variance_predictor,
    )
    from seamless_communication_tpu.ops.masks import (
        lengths_to_padding_mask, padding_bias,
    )
    from seamless_communication_tpu.ops.modules import (
        conv1d, embedding, layer_norm, linear,
    )
    import jax

    def premel_variant(kind):
        fft = cfg.fft_cfg()
        x = embedding(params["embed_tokens"], uj)
        x = _alpha_sin_pos(x, params["pos_emb_alpha_enc"], 1)
        umask = lengths_to_padding_mask(ul, 5)
        bias = padding_bias(umask)
        for lp in params["encoder_layers"]:
            x = fft_layer(lp, x, bias, umask, fft, cond=cj)
        pitch = variance_predictor(params["pitch_predictor"], x, umask, cond=cj)
        if kind != "no_vuv_gate":
            vuv = variance_predictor(params["vuv_predictor"], x, umask, cond=cj)
            pitch = pitch * (jax.nn.sigmoid(vuv) >= 0.5).astype(pitch.dtype)
        pe = conv1d(params["embed_pitch"], pitch[..., None])
        if kind == "sequential_variance":        # add_variance_parallel=False
            x = x + pe
            en = variance_predictor(params["energy_predictor"], x, umask, cond=cj)
            x = x + conv1d(params["embed_energy"], en[..., None])
        else:
            en = variance_predictor(params["energy_predictor"], x, umask, cond=cj)
            x = x + pe + conv1d(params["embed_energy"], en[..., None])
        if kind == "hard_upsample":
            x, total = hard_upsample(x, dj, T_mel)
        else:
            from seamless_communication_tpu.ops.upsample import gaussian_upsample
            x, total = gaussian_upsample(x, dj, T_mel, src_mask=umask)
        x = _alpha_sin_pos(x, params["pos_emb_alpha_dec"], 1)
        mmask = lengths_to_padding_mask(total, T_mel)
        mbias = padding_bias(mmask)
        for lp in params["decoder_layers"]:
            x = fft_layer(lp, x, mbias, mmask, fft, cond=cj)
        if kind == "final_norm":                 # PRE norm-order misreading
            x = layer_norm({"scale": jnp.ones(D), "bias": jnp.zeros(D)}, x)
        return linear(params["final_proj"], x)

    assert diff(premel_variant("exact")) < 5e-4  # guards the variant copy
    for kind in ("hard_upsample", "no_vuv_gate", "sequential_variance",
                 "final_norm"):
        assert diff(premel_variant(kind)) > 1e-3, kind
