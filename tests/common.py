"""Shared helpers for parity tests: convert torch module weights into this framework's
param pytrees. The HF transformers SeamlessM4T/v2 implementations (validated against the
reference checkpoints) serve as numerics oracles on tiny random configs — replacing the
reference's download-real-checkpoints strategy (SURVEY.md §4) with a hermetic one."""

from __future__ import annotations

import numpy as np


def t2j(t):
    import jax.numpy as jnp
    return jnp.asarray(t.detach().cpu().numpy())


def linear_from_torch(mod):
    p = {"weight": t2j(mod.weight).T}
    if mod.bias is not None:
        p["bias"] = t2j(mod.bias)
    return p


def layer_norm_from_torch(mod):
    return {"scale": t2j(mod.weight), "bias": t2j(mod.bias)}


def embedding_from_torch(mod):
    return {"embedding": t2j(mod.weight)}


def conv1d_from_torch(mod):
    """torch Conv1d weight (out, in/groups, k) -> jax WIO (k, in/groups, out)."""
    w = mod.weight.detach().cpu().numpy()
    p = {"weight": np.transpose(w, (2, 1, 0))}
    if mod.bias is not None:
        p["bias"] = mod.bias.detach().cpu().numpy()
    import jax.numpy as jnp
    return {k: jnp.asarray(v) for k, v in p.items()}


def batch_norm_fold(bn):
    """Fold torch BatchNorm1d (eval mode) into affine scale/bias."""
    import jax.numpy as jnp
    eps = bn.eps
    mean = bn.running_mean.detach().numpy()
    var = bn.running_var.detach().numpy()
    gamma = bn.weight.detach().numpy()
    beta = bn.bias.detach().numpy()
    scale = gamma / np.sqrt(var + eps)
    bias = beta - mean * scale
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}


def mha_from_torch(q, k, v, out):
    return {
        "q_proj": linear_from_torch(q),
        "k_proj": linear_from_torch(k),
        "v_proj": linear_from_torch(v),
        "output_proj": linear_from_torch(out),
    }
