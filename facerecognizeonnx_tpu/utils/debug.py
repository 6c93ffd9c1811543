"""Numerics debugging helpers (SURVEY.md §5: the TPU-native stand-in for
sanitizers — NaN trapping and parameter validation)."""

from __future__ import annotations

import contextlib
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def nan_checks():
    """Enable jax_debug_nans inside the context: any NaN produced by a
    jitted program raises with the offending primitive located."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def validate_params(params, name: str = "params") -> List[str]:
    """Return a list of problems (non-finite leaves, empty arrays)."""
    problems: List[str] = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        arr = np.asarray(leaf)
        key = name + jax.tree_util.keystr(path)
        if arr.size == 0:
            problems.append(f"{key}: empty array")
        elif np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            problems.append(f"{key}: {n_bad}/{arr.size} non-finite values")
    return problems


def tree_summary(params) -> Tuple[int, int]:
    """(num_leaves, num_parameters)."""
    leaves = jax.tree_util.tree_leaves(params)
    return len(leaves), sum(int(np.asarray(l).size) for l in leaves)
