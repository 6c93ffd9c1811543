"""Parameter checkpoint save/load.

The reference's only persistent state is its two ONNX weight files
loaded at startup (reference: src/main.cpp:269-284). Here params are
nested pytrees; they round-trip through flat-keyed .npz (fast, no deps)
and can also be imported from the original .onnx files via onnx_import.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip("/"): tree}
    for k, v in items:
        flat.update(_flatten(v, f"{prefix}{k}/"))
    return flat


def _unflatten(flat: Dict[str, np.ndarray]):
    root: Dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.isdigit() for k in node):
            return [node[str(i)] for i in range(len(node))]
        return node

    return listify(root)


def save_params(path: str, params) -> None:
    flat = {k: np.asarray(v) for k, v in _flatten(params).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str):
    with np.load(path) as data:
        return _unflatten({k: data[k] for k in data.files})


# ------------------------------------------------------- training states
# Orbax handles sharded arrays (multi-chip TrainState checkpoints restore
# with their shardings) — the resume path for train/trainer.py.


def save_train_state(path: str, state) -> None:
    import orbax.checkpoint as ocp

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def load_train_state(path: str, like):
    """Restore a TrainState saved by save_train_state. `like` provides
    the pytree structure/shardings (e.g. a freshly-initialized state)."""
    import orbax.checkpoint as ocp
    import jax

    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as ckptr:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(sharding=getattr(x, "sharding", None)),
            like,
        )
        restored = ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(
                item=like, restore_args=restore_args
            ),
        )
    return type(like)(*restored) if isinstance(restored, (list, tuple)) else restored
