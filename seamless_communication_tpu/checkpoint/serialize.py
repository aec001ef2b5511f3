"""Native parameter serialization: orbax for sharded training checkpoints, plus a
simple npz flat format for single-host tools (replaces the reference's GGML file
format, ggml_convert.py:414-577, and torch.save in the finetune trainer)."""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> dict:
    import jax
    out = {}
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    for keypath, leaf in leaves:
        parts = []
        for k in keypath:
            parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
        out[".".join(parts)] = np.asarray(leaf)
    return out


def save_params_npz(path: str, params: Any) -> None:
    np.savez(path, **_flatten(params))


def load_params_npz(path: str) -> dict:
    """Rebuild the nested dict/list pytree from the flat npz."""
    flat = np.load(path, allow_pickle=False)
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return _listify(root)


def _listify(node):
    """Convert {'0':..,'1':..} dicts back to lists."""
    if isinstance(node, dict):
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [_listify(node[str(i)]) for i in range(len(keys))]
        return {k: _listify(v) for k, v in node.items()}
    return node


def save_params(path: str, params: Any) -> None:
    if path.endswith(".npz"):
        save_params_npz(path, params)
        return
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str) -> Any:
    if path.endswith(".npz"):
        return load_params_npz(path)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
