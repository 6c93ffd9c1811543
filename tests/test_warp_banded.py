"""Banded warp vs the exact-gather warp (and cv2)."""

import numpy as np
import pytest
import jax.numpy as jnp

from facerecognizeonnx_tpu.ops.warp import warp_affine_batch
from facerecognizeonnx_tpu.ops.warp_banded import build_pyramid, warp_affine_banded


def _face_matrix(rng, scale, theta, tx, ty):
    A = scale * np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    # forward src→dst similarity mapping the face region to the 112 crop
    Ainv = np.linalg.inv(A)
    return np.hstack([Ainv, (-Ainv @ np.array([tx, ty]))[:, None]]).astype(
        np.float32
    )


def test_pyramid_shapes(rng):
    frames = jnp.asarray(rng.integers(0, 256, (2, 256, 256, 3), dtype=np.uint8))
    pyr = np.asarray(build_pyramid(frames))
    assert pyr.shape == (2, 4, 256, 256, 3)
    np.testing.assert_array_equal(pyr[:, 0], np.asarray(frames))
    # level 1 top-left = 2x2 means, zero elsewhere
    f = np.asarray(frames, np.float32)
    l1 = (f[:, 0::2, 0::2] + f[:, 1::2, 0::2] + f[:, 0::2, 1::2] + f[:, 1::2, 1::2]) / 4
    np.testing.assert_allclose(pyr[:, 1, :128, :128], np.floor(l1 + 0.5), atol=1)
    assert (pyr[:, 1, 128:] == 0).all() and (pyr[:, 1, :, 128:] == 0).all()


@pytest.mark.parametrize("theta", [0.0, 0.3, -0.7])
def test_level0_matches_gather_warp(rng, theta):
    """Faces whose source extent fits the band at level 0 must match the
    exact bilinear gather path (bf16 weights → ~1 LSB tolerance)."""
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))
    Ms = np.stack(
        [_face_matrix(rng, scale=1.0, theta=theta, tx=200, ty=150) for _ in range(2)]
    )[None]
    got = np.asarray(warp_affine_banded(frames, jnp.asarray(Ms), 112, band=128))
    ref = np.asarray(warp_affine_batch(frames, jnp.asarray(Ms), 112, 112))
    assert got.shape == ref.shape == (1, 2, 112, 112, 3)
    diff = np.abs(got - ref)
    assert np.median(diff) <= 0.5
    assert diff.max() <= 2.0


def test_zero_border_outside_frame(rng):
    frames = jnp.asarray(rng.integers(1, 256, (1, 640, 640, 3), dtype=np.uint8))
    # map the crop to a region hanging off the top-left corner
    M = _face_matrix(rng, scale=1.0, theta=0.0, tx=-56, ty=-56)[None, None]
    got = np.asarray(warp_affine_banded(frames, jnp.asarray(M), 112, band=128))[0, 0]
    ref = np.asarray(
        warp_affine_batch(frames, jnp.asarray(M), 112, 112)
    )[0, 0]
    np.testing.assert_allclose(got, ref, atol=2.0)
    assert got[:40, :40].max() == 0.0  # off-frame region is zero


def test_large_face_uses_mip_and_stays_sane(rng):
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))
    # scale 0.2: source extent 112/0.2 = 560 px → needs level ≥ 2
    M = _face_matrix(rng, scale=0.2, theta=0.2, tx=50, ty=40)[None, None]
    got = np.asarray(warp_affine_banded(frames, jnp.asarray(M), 112, band=128))[0, 0]
    ref = np.asarray(warp_affine_batch(frames, jnp.asarray(M), 112, 112))[0, 0]
    assert np.isfinite(got).all()
    # mip sampling ≈ downfiltered bilinear: agree in the mean, loosely per px
    assert abs(got.mean() - ref.mean()) < 3.0
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9


def test_degenerate_matrix_does_not_nan():
    frames = jnp.zeros((1, 640, 640, 3), jnp.uint8)
    M = jnp.zeros((1, 1, 2, 3), jnp.float32)
    got = np.asarray(warp_affine_banded(frames, M, 112, band=128))
    assert np.isfinite(got).all()
