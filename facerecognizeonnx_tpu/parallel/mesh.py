"""Device mesh construction.

The reference's only concurrency is a 4-thread ORT intra-op pool
(src/face_detector.cpp:10); the TPU-native scaling surface is a
`jax.sharding.Mesh` with named axes:

  "data"  — batch/frame parallelism (enrollment, video streams)
  "model" — sharding of the long model axis: the 1:N gallery rows and
            the ArcFace classifier columns (partial-FC)

Collectives ride ICI within a slice; multi-host galleries extend the
same axis over DCN (jax.distributed) — same program, bigger mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_names: Sequence[str] = ("data", "model"),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Mesh over all (or given) devices.

    shape=None puts every device on the FIRST axis and 1 on the rest —
    the right default for a single chip (everything degenerates to
    local compute) and for pure data parallelism.
    """
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)
