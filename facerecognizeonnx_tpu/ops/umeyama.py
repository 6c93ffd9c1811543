"""Closed-form least-squares similarity transform (batched, jit-safe).

Replaces cv2::estimateAffinePartial2D in the reference's alignment step
(reference: src/face_recognizer.cpp:110-113). estimateAffinePartial2D
fits the 4-DOF map  q ≈ [[a, -b], [b, a]] p + t  in least squares; that
problem is linear in (a, b, tx, ty) and has the closed form implemented
here — no SVD, no iterative solver, fully vmappable. For non-degenerate
face landmarks this coincides with the classic Umeyama solution (no
reflection branch is ever needed for the 4-DOF parameterization).

The canonical ArcFace 112x112 5-point template is the reference's
(src/face_recognizer.cpp:101-107).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

# L-eye, R-eye, nose, L-mouth, R-mouth on the 112x112 crop
# (reference: src/face_recognizer.cpp:101-107).
ARCFACE_DST_5PTS = np.array(
    [
        [38.2946, 51.6963],
        [73.5318, 51.5014],
        [56.0252, 71.7366],
        [41.5493, 92.3655],
        [70.7299, 92.2041],
    ],
    dtype=np.float32,
)


def umeyama(src: jnp.ndarray, dst: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Least-squares similarity transform src→dst.

    src: (..., N, 2) source points (detected landmarks, image pixels)
    dst: (N, 2) or broadcastable (..., N, 2) target points (template)

    Returns (M, valid): M (..., 2, 3) with dst ≈ M[:, :2] @ src + M[:, 2],
    and valid (...,) bool — False when the fit is degenerate (all source
    points coincide), in which case the caller should use the reference's
    crop-and-resize fallback (src/face_recognizer.cpp:116-127).
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.broadcast_to(jnp.asarray(dst, jnp.float32), src.shape)

    mu_s = src.mean(axis=-2, keepdims=True)  # (..., 1, 2)
    mu_d = dst.mean(axis=-2, keepdims=True)
    ps = src - mu_s
    qd = dst - mu_d

    var_s = (ps * ps).sum(axis=(-1, -2))  # (...,)
    # a = Σ(p·q) / Σ|p|²  ;  b = Σ(p × q) / Σ|p|²
    dot = (ps * qd).sum(axis=(-1, -2))
    cross = (ps[..., 0] * qd[..., 1] - ps[..., 1] * qd[..., 0]).sum(axis=-1)

    valid = (var_s > 1e-6) & jnp.isfinite(var_s) & jnp.isfinite(dot) & jnp.isfinite(cross)
    safe_var = jnp.where(valid, var_s, 1.0)
    a = dot / safe_var
    b = cross / safe_var

    rot = jnp.stack(
        [jnp.stack([a, -b], axis=-1), jnp.stack([b, a], axis=-1)], axis=-2
    )  # (..., 2, 2)
    t = mu_d[..., 0, :] - jnp.einsum("...ij,...j->...i", rot, mu_s[..., 0, :])
    M = jnp.concatenate([rot, t[..., None]], axis=-1)  # (..., 2, 3)
    return M, valid
