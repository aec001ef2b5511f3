"""Raw-waveform wav2vec2 encoder (XLSR2-1B variant) for unit extraction
(reference models/unit_extractor/wav2vec2_layer_output.py:23-117):

conv feature extractor [(512,k10,s5)] + 4x(512,k3,s2) + 2x(512,k2,s2) with
per-layer LayerNorm + GELU -> post-extract LN + proj to 1280 -> conv positional
encoder (k=128, 16 groups, GELU) -> 48 pre-LN transformer layers (dim 1280,
ffn 5120, 16 heads) with early exit at ``out_layer_idx`` (layer 35 for units).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.masks import lengths_to_padding_mask, padding_bias
from seamless_communication_tpu.ops.modules import (
    conv1d, conv1d_init, layer_norm, layer_norm_init, linear, linear_init,
)
from seamless_communication_tpu.ops.transformer import (
    TransformerConfig, _layer_forward, transformer_layer_init,
)


class Wav2Vec2RawConfig(NamedTuple):
    model_dim: int = 1280
    feature_dim: int = 512
    conv_layers: Sequence[tuple] = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    num_layers: int = 48
    num_heads: int = 16
    ffn_inner_dim: int = 5120

    def layer_cfg(self) -> TransformerConfig:
        return TransformerConfig(self.model_dim, self.num_layers, self.num_heads,
                                 self.ffn_inner_dim, "gelu", 1, 0, 4096, False)

    def downsample_factor(self) -> int:
        f = 1
        for _, _, s in self.conv_layers:
            f *= s
        return f


def wav2vec2_raw_init(key: jax.Array, cfg: Wav2Vec2RawConfig, *,
                      dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8 + len(cfg.conv_layers) + cfg.num_layers))
    convs = []
    in_ch = 1
    for out_ch, k, s in cfg.conv_layers:
        convs.append({
            "conv": conv1d_init(next(ks), in_ch, out_ch, k, bias=True, dtype=dtype),
            "norm": layer_norm_init(out_ch, dtype=dtype),
        })
        in_ch = out_ch
    layers = [transformer_layer_init(next(ks), cfg.layer_cfg(), dtype=dtype)
              for _ in range(cfg.num_layers)]
    return {
        "feature_extractor": convs,
        "post_extract_norm": layer_norm_init(cfg.feature_dim, dtype=dtype),
        "post_extract_proj": linear_init(next(ks), cfg.feature_dim, cfg.model_dim,
                                         dtype=dtype),
        "pos_conv": conv1d_init(next(ks), cfg.model_dim, cfg.model_dim,
                                cfg.pos_conv_kernel, groups=cfg.pos_conv_groups,
                                dtype=dtype),
        "encoder_norm": layer_norm_init(cfg.model_dim, dtype=dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


def _feature_extract(params: list, wav: jax.Array, cfg: Wav2Vec2RawConfig
                     ) -> jax.Array:
    x = wav[..., None]            # (B, T, 1)
    for p, (_, k, s) in zip(params, cfg.conv_layers):
        x = conv1d(p["conv"], x, stride=s, padding="VALID")
        x = layer_norm(p["norm"], x)
        x = jax.nn.gelu(x)
    return x


def wav2vec2_layer_output(params: dict, wav: jax.Array, lengths: jax.Array,
                          cfg: Wav2Vec2RawConfig, *, out_layer_idx: int = 34
                          ) -> tuple[jax.Array, jax.Array]:
    """(B, T_samples) normalized waveform -> features of encoder layer
    ``out_layer_idx`` (0-based; 34 = 35th layer, reference :96-117) with the scan
    early-exited via masking (static cost: full depth; correct output selected)."""
    feats = _feature_extract(params["feature_extractor"], wav, cfg)
    feats = layer_norm(params["post_extract_norm"], feats)
    x = linear(params["post_extract_proj"], feats)

    out_lens = lengths
    for _, k, s in cfg.conv_layers:
        out_lens = (out_lens - k) // s + 1
    mask = lengths_to_padding_mask(out_lens, x.shape[1])

    # conv positional embedding (k even: trim one trailing step, w2v2 convention)
    pos = conv1d(params["pos_conv"], x, padding=(cfg.pos_conv_kernel // 2,
                                                 cfg.pos_conv_kernel // 2),
                 groups=cfg.pos_conv_groups)
    if cfg.pos_conv_kernel % 2 == 0:
        pos = pos[:, :x.shape[1]]
    x = x + jax.nn.gelu(pos[:, :x.shape[1]])
    x = layer_norm(params["encoder_norm"], x)

    bias = padding_bias(mask)
    lcfg = cfg.layer_cfg()

    def body(carry, scanned):
        h, idx = carry
        layer_p = scanned
        new_h = _layer_forward(layer_p, h, lcfg, self_bias=bias, enc_out=None,
                               cross_bias=None)
        # freeze the stream once past the output layer
        h = jnp.where(idx <= out_layer_idx, new_h, h)
        return (h, idx + 1), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.asarray(0)), params["layers"])
    return x, out_lens
