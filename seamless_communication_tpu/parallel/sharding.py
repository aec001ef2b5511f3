"""Device-mesh parallelism: parameter/activation sharding rules.

The reference's only distributed mode is DDP over NCCL
(cli/m4t/finetune/dist_utils.py:63-69; SURVEY.md §2.11). Here parallelism is
first-class and TPU-native: one ``jax.sharding.Mesh`` with axes ``("data", "model")``;
data parallelism shards the batch over "data" (psum gradient reduction inserted by
XLA over ICI, replacing NCCL all-reduce), and megatron-style tensor parallelism
shards attention heads / FFN hidden over "model".

Rules are path-based over the param pytree:
  - q/k/v projections, ffn inner:   (in, out)   -> P(None, "model")   [column]
  - output projections, ffn output: (in, out)   -> P("model", None)   [row]
  - embeddings (vocab, dim)         -> P("model", None)               [vocab-sharded]
  - biases of column-parallel layers -> P("model"); everything else replicated
Scan-stacked layer params carry a leading layer axis -> specs shift right by one.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, model: int = 1, pipe: int = 1, devices=None) -> Mesh:
    """("data", "model") mesh; with ``pipe`` > 1, ("data", "model", "pipe") —
    the extra axis feeds GPipe pipeline parallelism (parallel/pipeline.py)."""
    devices = devices if devices is not None else jax.devices()
    n = data * model * pipe
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if pipe > 1:
        arr = np.asarray(devices[:n]).reshape(data, model, pipe)
        return Mesh(arr, ("data", "model", "pipe"))
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# path-suffix -> (spec_without_layer_axis)
_COLUMN = {"q_proj", "k_proj", "v_proj", "inner_proj", "conv1"}
_ROW = {"output_proj", "out_proj", "conv2"}
_EMBED = {"embed", "embedding", "embed_char", "unit_embedding"}


def param_partition_spec(path: Sequence[str], shape: tuple, *,
                         stacked: bool) -> P:
    """Decide a PartitionSpec from the param's pytree path and shape."""
    parts = [str(p) for p in path]
    name = None
    parent = None
    for i, p in enumerate(parts):
        if p in ("weight", "bias", "scale", "embedding"):
            name = p
            parent = parts[i - 1] if i > 0 else ""
    if name is None:
        parent = parts[-1] if parts else ""
        name = parts[-1] if parts else ""

    ndim = len(shape)
    lead = ("layers" in parts or stacked) and ndim >= 2

    def pad(spec_tail: list) -> P:
        # prepend None for the stacked-layer axis if present
        full = [None] * (ndim - len(spec_tail)) + spec_tail
        return P(*full)

    # embeddings: shard vocab dim
    if name == "embedding" and ndim >= 2 and shape[-2] >= 1024:
        return pad(["model", None])

    if name == "weight" and ndim >= 2:
        if parent in _COLUMN:
            return pad([None, "model"])
        if parent in _ROW:
            return pad(["model", None])
    if name == "bias" and parent in _COLUMN and ndim >= 1:
        return pad(["model"])
    return P()  # replicate


def _iter_with_path(tree):
    return jax.tree_util.tree_flatten_with_path(tree)


def _path_strs(keypath) -> list:
    out = []
    for k in keypath:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return out


def with_param_shardings(params, mesh: Mesh):
    """Return a pytree of NamedShardings matching ``params``."""
    leaves, treedef = _iter_with_path(params)
    shardings = []
    for keypath, leaf in leaves:
        path = _path_strs(keypath)
        spec = param_partition_spec(path, getattr(leaf, "shape", ()),
                                    stacked=False)
        # validate divisibility and axis presence; fall back to replication
        # when the named axis doesn't divide (or isn't in this mesh)
        ok = True
        model_size = mesh.shape.get("model", 1)
        for dim, axis in zip(getattr(leaf, "shape", ()), spec):
            if axis is not None and axis not in mesh.shape:
                ok = False
            elif axis == "model" and dim % model_size != 0:
                ok = False
        shardings.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_params(params, mesh: Mesh):
    """Place ``params`` on the mesh according to the rules."""
    shardings = with_param_shardings(params, mesh)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))
