"""MuToX speech/text toxicity classifier (reference toxicity/mutox/classifier.py:16-60,
builder.py:17-83): sentence embeddings -> MLP 1024 -> 512 -> 128 -> 1 (logit).

The upstream SONAR embedder is an external model; any callable producing 1024-d
embeddings plugs in (``embedder`` argument of ``MutoxClassifier.predict``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from seamless_communication_tpu.ops.modules import (
    layer_norm, layer_norm_init, linear, linear_init,
)


class MutoxConfig(NamedTuple):
    input_size: int = 1024
    hidden_sizes: tuple = (512, 128)
    # the reference MLP is plain Dropout/ReLU + Linear, NO norms
    # (toxicity/mutox/builder.py:44-64)
    use_layer_norm: bool = False


def mutox_init(key: jax.Array, cfg: MutoxConfig = MutoxConfig(), *,
               dtype=jnp.float32) -> dict:
    dims = (cfg.input_size,) + tuple(cfg.hidden_sizes) + (1,)
    ks = jax.random.split(key, len(dims) - 1)
    layers = []
    for i in range(len(dims) - 1):
        layer = {"linear": linear_init(ks[i], dims[i], dims[i + 1], dtype=dtype)}
        if cfg.use_layer_norm and i < len(dims) - 2:
            layer["norm"] = layer_norm_init(dims[i], dtype=dtype)
        layers.append(layer)
    return {"layers": layers}


def mutox_forward(params: dict, embeddings: jax.Array,
                  cfg: MutoxConfig = MutoxConfig()) -> jax.Array:
    """(B, input_size) sentence embeddings -> (B,) toxicity logits."""
    h = embeddings
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        if "norm" in layer:
            h = layer_norm(layer["norm"], h)
        h = linear(layer["linear"], h)
        if i < n - 1:
            h = jax.nn.relu(h)
    return h[..., 0]


class MutoxClassifier:
    def __init__(self, params: dict, cfg: MutoxConfig = MutoxConfig()):
        self.params = params
        self.cfg = cfg
        self._fwd = jax.jit(lambda p, e: mutox_forward(p, e, cfg))

    def predict(self, inputs: Sequence, embedder: Callable) -> jax.Array:
        """``embedder(inputs) -> (B, 1024)`` (SONAR text/speech encoder)."""
        emb = jnp.asarray(embedder(inputs))
        return self._fwd(self.params, emb)
