"""Image-op parity vs OpenCV (the reference's L2 layer, SURVEY.md §1)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.ops.image import (
    letterbox,
    letterbox_params,
    normalize_to_rgb,
    resize_bilinear,
)


def _ref_letterbox(img: np.ndarray, target: int):
    """numpy+cv2 transcription of src/face_detector.cpp:92-137 semantics."""
    h, w = img.shape[:2]
    scale = min(target / w, target / h)
    nw, nh = int(w * scale), int(h * scale)
    resized = cv2.resize(img, (nw, nh))
    padded = np.zeros((target, target, 3), np.uint8)
    padded[:nh, :nw] = resized
    return padded, scale


@pytest.mark.parametrize("hw", [(480, 640), (1080, 1920), (640, 640), (333, 517)])
def test_letterbox_matches_cv2(rng, hw):
    h, w = hw
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    ref, ref_scale = _ref_letterbox(img, 640)
    got, got_scale = letterbox(jnp.asarray(img), 640)
    got = np.asarray(got)

    assert got_scale == pytest.approx(ref_scale)
    assert got.shape == (640, 640, 3)
    # cv2 resizes in uint8 fixed point; we stay float — allow ~2 LSB.
    assert np.abs(got - ref.astype(np.float32)).max() <= 2.0
    # padding region must be exactly zero
    _, nh, nw = letterbox_params(h, w, 640)
    assert np.all(got[letterbox_params(h, w, 640)[1]:, :] == 0) or nh == 640
    if nw < 640:
        assert np.all(got[:, nw:] == 0)


def test_letterbox_scale_truncation():
    # int() truncation of resized dims (src/face_detector.cpp:105-106)
    scale, nh, nw = letterbox_params(333, 517, 640)
    assert scale == pytest.approx(min(640 / 517, 640 / 333))
    assert nw == int(517 * scale) and nh == int(333 * scale)


def test_resize_bilinear_matches_cv2(rng):
    img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    ref = cv2.resize(img, (112, 112)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 112, 112))
    assert np.abs(got - ref).max() <= 2.0


def test_normalize_to_rgb(rng):
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    out = np.asarray(normalize_to_rgb(jnp.asarray(img)))
    # channel flip BGR→RGB + (px-127.5)/128 (src/face_detector.cpp:124-136)
    expect = (img[..., ::-1].astype(np.float32) - 127.5) / 128.0
    np.testing.assert_allclose(out, expect, rtol=0, atol=1e-6)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_normalize_batched(rng):
    imgs = rng.integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    out = np.asarray(normalize_to_rgb(jnp.asarray(imgs)))
    assert out.shape == (4, 8, 8, 3)
    expect = (imgs[..., ::-1].astype(np.float32) - 127.5) / 128.0
    np.testing.assert_allclose(out, expect, atol=1e-6)
