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
