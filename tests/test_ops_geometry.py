"""Similarity-transform + warp parity vs OpenCV.

Oracles: cv2.estimateAffinePartial2D (reference alignment,
src/face_recognizer.cpp:110-113) and cv2.warpAffine (:129-130).
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.ops.umeyama import ARCFACE_DST_5PTS, umeyama
from facerecognizeonnx_tpu.ops.warp import (
    crop_resize_affine,
    invert_affine,
    warp_affine,
)


def _random_landmarks(rng, n=5, jitter=3.0):
    """ArcFace template mapped by a random similarity + noise."""
    theta = rng.uniform(-0.5, 0.5)
    s = rng.uniform(0.8, 4.0)
    t = rng.uniform(50, 300, 2)
    R = s * np.array([[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]])
    pts = ARCFACE_DST_5PTS @ R.T + t
    return (pts + rng.normal(0, jitter, pts.shape)).astype(np.float32)


def test_umeyama_recovers_exact_similarity(rng):
    src = _random_landmarks(rng, jitter=0.0)
    M, valid = umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_DST_5PTS))
    M = np.asarray(M)
    assert bool(valid)
    mapped = src @ M[:, :2].T + M[:, 2]
    np.testing.assert_allclose(mapped, ARCFACE_DST_5PTS, atol=1e-3)


def test_umeyama_matches_estimate_affine_partial2d(rng):
    for _ in range(10):
        src = _random_landmarks(rng, jitter=2.0)
        M_cv, _ = cv2.estimateAffinePartial2D(
            src, ARCFACE_DST_5PTS, method=cv2.LMEDS
        )
        M, valid = umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_DST_5PTS))
        assert bool(valid)
        np.testing.assert_allclose(np.asarray(M), M_cv, atol=0.15)


def test_umeyama_batched(rng):
    src = np.stack([_random_landmarks(rng) for _ in range(7)])
    M, valid = umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_DST_5PTS))
    assert M.shape == (7, 2, 3)
    assert valid.shape == (7,)
    assert bool(valid.all())


def test_umeyama_degenerate_flags_invalid():
    src = np.full((5, 2), 37.0, np.float32)  # all points coincide
    _, valid = umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_DST_5PTS))
    assert not bool(valid)


def test_invert_affine_roundtrip(rng):
    M = np.array([[1.3, -0.4, 10.0], [0.4, 1.3, -5.0]], np.float32)
    Minv = np.asarray(invert_affine(jnp.asarray(M)))
    A = np.vstack([M, [0, 0, 1]])
    Ainv = np.vstack([Minv, [0, 0, 1]])
    np.testing.assert_allclose(A @ Ainv, np.eye(3), atol=1e-5)


def test_warp_affine_matches_cv2(rng):
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    src = _random_landmarks(rng, jitter=1.0) * 0.5  # keep inside image
    M_cv, _ = cv2.estimateAffinePartial2D(src, ARCFACE_DST_5PTS, method=cv2.LMEDS)
    ref = cv2.warpAffine(img, M_cv, (112, 112)).astype(np.float32)
    got = np.asarray(warp_affine(jnp.asarray(img), jnp.asarray(M_cv, dtype=jnp.float32), 112, 112))
    # interior pixels should agree to ~2 LSB (cv2 uses fixed-point bilinear)
    diff = np.abs(got - ref)
    assert np.median(diff) <= 1.0
    assert (diff > 4).mean() < 0.02  # allow edge-of-border rounding disagreements


def test_crop_resize_affine_matches_cv2_resize(rng):
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    x1, y1, x2, y2 = 40, 30, 200, 180
    ref = cv2.resize(img[y1:y2, x1:x2], (112, 112)).astype(np.float32)
    M = crop_resize_affine(jnp.asarray([x1, y1, x2, y2], jnp.float32), 112, 112)
    got = np.asarray(warp_affine(jnp.asarray(img), M, 112, 112, border="clamp"))
    diff = np.abs(got - ref)
    assert np.median(diff) <= 1.0
    assert diff.max() <= 4.0


def test_warp_affine_vmap_batch(rng):
    img = rng.integers(0, 256, (100, 100, 3), dtype=np.uint8)
    Ms = []
    for _ in range(4):
        src = _random_landmarks(rng) * 0.3
        M, _ = umeyama(jnp.asarray(src), jnp.asarray(ARCFACE_DST_5PTS))
        Ms.append(M)
    Ms = jnp.stack(Ms)
    out = jax.vmap(lambda m: warp_affine(jnp.asarray(img), m, 112, 112))(Ms)
    assert out.shape == (4, 112, 112, 3)
