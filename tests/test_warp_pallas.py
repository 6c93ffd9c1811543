"""Pallas warp kernel vs the banded/gather references (interpret mode)."""

import numpy as np
import pytest
import jax.numpy as jnp

from facerecognizeonnx_tpu.ops.warp import warp_affine_batch
from facerecognizeonnx_tpu.ops.warp_pallas import build_pyramid_cf, warp_affine_pallas
from tests.test_warp_banded import _face_matrix


def test_pyramid_cf_layout(rng):
    from facerecognizeonnx_tpu.ops.warp_pallas import PAD_H, PAD_W

    frames = jnp.asarray(rng.integers(0, 256, (1, 256, 256, 3), dtype=np.uint8))
    pyr = np.asarray(build_pyramid_cf(frames)).astype(np.float32)
    assert pyr.shape == (1, 4, 3, PAD_H, PAD_W)
    np.testing.assert_array_equal(
        pyr[0, 0, :, :256, :256], np.asarray(frames)[0].transpose(2, 0, 1)
    )
    assert (pyr[0, 0, :, 256:] == 0).all()  # canvas padding stays zero


@pytest.mark.parametrize("theta", [0.0, 0.35])
def test_matches_gather_level0(rng, theta):
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))
    # scales ≤0.7 keep the rotated source AABB inside the level-0
    # window (span = 111·s·(|cosθ|+|sinθ|)+2 < COVER=110) — exact-path
    # faces; larger faces anti-alias through the mip levels
    Ms = np.stack(
        [
            _face_matrix(rng, scale=0.6, theta=theta, tx=250, ty=180),
            _face_matrix(rng, scale=0.7, theta=-theta, tx=380, ty=300),
        ]
    )[None]
    got = np.asarray(
        warp_affine_pallas(frames, jnp.asarray(Ms), interpret=True)
    )
    ref = np.asarray(warp_affine_batch(frames, jnp.asarray(Ms), 112, 112))
    assert got.shape == ref.shape
    diff = np.abs(got - ref)
    assert np.median(diff) <= 0.5
    assert diff.max() <= 2.0


def test_large_face_mip_path(rng):
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))
    M = _face_matrix(rng, scale=0.2, theta=0.1, tx=60, ty=60)[None, None]
    got = np.asarray(warp_affine_pallas(frames, jnp.asarray(M), interpret=True))[0, 0]
    ref = np.asarray(warp_affine_batch(frames, jnp.asarray(M), 112, 112))[0, 0]
    assert np.isfinite(got).all()
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9


def test_mixed_levels_match_banded(rng):
    """A batch mixing small (level-0) and large (mip-level) faces must
    agree with the XLA banded implementation face-by-face (same mip +
    hat-weight semantics)."""
    from facerecognizeonnx_tpu.ops.warp_banded import warp_affine_banded

    frames = jnp.asarray(rng.integers(0, 256, (2, 640, 640, 3), dtype=np.uint8))
    Ms = np.stack(
        [
            np.stack(
                [
                    _face_matrix(rng, scale=0.8, theta=0.1, tx=200, ty=150),
                    _face_matrix(rng, scale=0.25, theta=-0.2, tx=80, ty=60),
                ]
            )
            for _ in range(2)
        ]
    )
    got = np.asarray(warp_affine_pallas(frames, jnp.asarray(Ms), interpret=True))
    ref = np.asarray(warp_affine_banded(frames, jnp.asarray(Ms), 112, band=128))
    # same mip construction; banded uses per-row windows, pallas per-face —
    # identical sampling up to bf16 weight quantization
    assert np.isfinite(got).all()
    for b in range(2):
        for k in range(2):
            corr = np.corrcoef(got[b, k].ravel(), ref[b, k].ravel())[0, 1]
            assert corr > 0.98, (b, k, corr)


def test_degenerate_matrix_safe():
    frames = jnp.zeros((1, 640, 640, 3), jnp.uint8)
    M = jnp.zeros((1, 1, 2, 3), jnp.float32)
    got = np.asarray(warp_affine_pallas(frames, M, interpret=True))
    assert np.isfinite(got).all()


def test_xpass_bf16_within_lsb(rng):
    """v4a bf16 x-pass stays within ~1 intensity LSB of the f32 pass
    (each hat row has ≤2 nonzeros, so the bf16 sum adds two products of
    u8-valued pixels — see the kernel comment)."""
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))
    Ms = np.stack(
        [
            _face_matrix(rng, scale=0.6, theta=0.4, tx=250, ty=180),
            _face_matrix(rng, scale=1.3, theta=-0.7, tx=380, ty=300),
        ]
    )[None]
    f32 = np.asarray(warp_affine_pallas(frames, jnp.asarray(Ms), interpret=True))
    bf = np.asarray(
        warp_affine_pallas(frames, jnp.asarray(Ms), interpret=True, xpass_bf16=True)
    )
    d = np.abs(f32 - bf)
    assert np.percentile(d, 99) <= 1.0, np.percentile(d, 99)
    assert d.max() <= 2.5, d.max()


def _spread_matrices(rng, B, K):
    return np.stack(
        [
            np.stack(
                [
                    _face_matrix(rng, scale=0.6, theta=0.3, tx=250, ty=180),
                    _face_matrix(rng, scale=0.7, theta=-0.2, tx=380, ty=300),
                    _face_matrix(rng, scale=0.2, theta=0.1, tx=60, ty=60),
                    _face_matrix(rng, scale=0.9, theta=0.0, tx=500, ty=550),
                ][:K]
            )
            for _ in range(B)
        ]
    )


def test_xmajor_matches_ymajor(rng):
    """The v5 transposed-pyramid kernel reproduces the y-major kernel
    across mip levels and frame-edge windows (measured byte-identical
    on v5e; interpret mode here)."""
    frames = jnp.asarray(rng.integers(0, 256, (2, 640, 640, 3), dtype=np.uint8))
    Ms = jnp.asarray(_spread_matrices(rng, 2, 4))
    ref = np.asarray(warp_affine_pallas(frames, Ms, interpret=True))
    got = np.asarray(
        warp_affine_pallas(frames, Ms, interpret=True, layout="xmajor")
    )
    d = np.abs(got - ref)
    assert d.max() <= 2.0, d.max()
    assert np.median(d) <= 0.5


def test_xmajor_epilogue_normalized_rgb(rng):
    """epilogue=(mean, scale) emits embed-ready bf16 normalized RGB ==
    normalize_to_rgb(raw warp) up to bf16 rounding."""
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))
    Ms = jnp.asarray(_spread_matrices(rng, 1, 4))
    raw = np.asarray(
        warp_affine_pallas(frames, Ms, interpret=True, layout="xmajor")
    )
    got = np.asarray(
        warp_affine_pallas(
            frames, Ms, interpret=True, layout="xmajor", epilogue=(127.5, 128.0)
        )
    ).astype(np.float32)
    assert got.dtype == np.float32  # cast from bf16 output
    want = (raw[..., ::-1] - 127.5) / 128.0
    assert np.abs(got - want).max() <= 2.0 / 128.0 + 0.01


def test_xmajor_valid_skip(rng):
    """valid=False slots come back all-zero; valid slots are unaffected
    by the skip machinery."""
    frames = jnp.asarray(rng.integers(0, 256, (2, 640, 640, 3), dtype=np.uint8))
    Ms = jnp.asarray(_spread_matrices(rng, 2, 4))
    valid = jnp.asarray([[True, False, True, False], [False, True, True, True]])
    ref = np.asarray(
        warp_affine_pallas(frames, Ms, interpret=True, layout="xmajor")
    )
    got = np.asarray(
        warp_affine_pallas(
            frames, Ms, interpret=True, layout="xmajor", valid=valid
        )
    )
    v = np.asarray(valid)
    assert (got[~v] == 0).all()
    np.testing.assert_array_equal(got[v], ref[v])


def test_align_faces_batch_normalized_contract(rng):
    """align_faces_batch(normalized=True, valid=...) on the portable
    gather path: invalid slots zero in normalized space, valid slots ==
    normalize_to_rgb(raw)."""
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.embed.pipeline import align_faces_batch
    from facerecognizeonnx_tpu.ops.image import normalize_to_rgb

    cfg = PipelineConfig(warp_impl="gather")
    frames = jnp.asarray(rng.integers(0, 256, (1, 320, 320, 3), dtype=np.uint8))
    kps = jnp.asarray(
        rng.uniform(100, 220, (1, 2, 5, 2)).astype(np.float32)
    )
    boxes = jnp.asarray([[[80, 80, 240, 240], [60, 60, 200, 200]]], jnp.float32)
    valid = jnp.asarray([[True, False]])
    raw = align_faces_batch(frames, kps, boxes, cfg)
    got = np.asarray(
        align_faces_batch(frames, kps, boxes, cfg, valid=valid, normalized=True)
    )
    want = np.asarray(normalize_to_rgb(raw, 127.5, 128.0))
    assert (got[0, 1] == 0).all()
    np.testing.assert_allclose(got[0, 0], want[0, 0], atol=1e-5)
