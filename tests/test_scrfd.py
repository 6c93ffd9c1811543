"""SCRFD model + anchor decode + detect pipeline tests.

Decode oracle: hand-computed InsightFace SCRFD semantics (the reference
never implemented this — SURVEY.md §2 quirk — so the oracle is the
published decode convention, verified by construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.decode import (
    anchor_centers,
    decode_outputs,
    distance2bbox,
    distance2kps,
)
from facerecognizeonnx_tpu.detect.pipeline import detect_program, postprocess
from facerecognizeonnx_tpu.models import scrfd

CFG = PipelineConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def det_params():
    return scrfd.init_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def det_params_cal(det_params):
    """BN-calibrated params: well-conditioned activations (see
    test_arcface._floor_bn_var for why this matters for parity)."""
    from tests.test_arcface import _floor_bn_var

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    _, stats = scrfd.apply(det_params, x, train=True)
    from facerecognizeonnx_tpu.models.layers import update_bn_stats

    return _floor_bn_var(update_bn_stats(det_params, stats))


def test_forward_shapes(det_params):
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    outs = scrfd.apply(det_params, x)
    # 9 tensors: 3 strides × (scores, bbox, kps) — the real det_500m.onnx
    # output contract (SURVEY.md §2 C21)
    assert set(outs.keys()) == {8, 16, 32}
    for stride, (s, b, k) in outs.items():
        n = (640 // stride) ** 2 * 2
        assert s.shape == (1, n, 1)
        assert b.shape == (1, n, 4)
        assert k.shape == (1, n, 10)
        sv = np.asarray(s)
        assert sv.min() >= 0.0 and sv.max() <= 1.0  # post-sigmoid


def test_anchor_centers_layout():
    c = anchor_centers(640, 32, 2)
    assert c.shape == (800, 2)
    # row-major, x fastest, interleaved anchor pairs
    np.testing.assert_array_equal(c[0], [0, 0])
    np.testing.assert_array_equal(c[1], [0, 0])
    np.testing.assert_array_equal(c[2], [32, 0])
    np.testing.assert_array_equal(c[3], [32, 0])
    np.testing.assert_array_equal(c[40], [640 - 0, 0] if False else c[40])
    # second row starts after 20 locations × 2 anchors
    np.testing.assert_array_equal(c[40], [0, 32])


def test_distance2bbox_and_kps():
    pts = jnp.asarray([[100.0, 200.0]])
    d = jnp.asarray([[10.0, 20.0, 30.0, 40.0]])
    box = np.asarray(distance2bbox(pts, d))[0]
    np.testing.assert_allclose(box, [90, 180, 130, 240])
    kd = jnp.asarray([[1.0, 2.0, -3.0, -4.0, 0.0, 0.0, 5.0, 5.0, -1.0, 1.0]])
    kp = np.asarray(distance2kps(pts, kd))[0]
    np.testing.assert_allclose(kp[0], [101, 202])
    np.testing.assert_allclose(kp[1], [97, 196])
    np.testing.assert_allclose(kp[2], [100, 200])


def test_decode_concat_count(det_params):
    x = jnp.zeros((1, 640, 640, 3), jnp.float32)
    outs = scrfd.apply(det_params, x)
    scores, boxes, kps = decode_outputs(outs, 640)
    n = 2 * (80**2 + 40**2 + 20**2)  # 16800
    assert scores.shape == (1, n)
    assert boxes.shape == (1, n, 4)
    assert kps.shape == (1, n, 5, 2)


def test_parity_vs_torch(det_params_cal, rng):
    from tests.oracles.torch_models import scrfd_forward

    x = rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32)
    got = scrfd.apply(det_params_cal, jnp.asarray(x))
    ref = scrfd_forward(det_params_cal, x)
    for stride in (8, 16, 32):
        for g, r in zip(got[stride], ref[stride]):
            np.testing.assert_allclose(np.asarray(g), r, atol=2e-3)


def test_postprocess_synthetic():
    """Plant two known faces in a synthetic anchor map; check threshold,
    rescale, and NMS behavior end to end."""
    n = 64
    scores = np.full((n,), 0.01, np.float32)
    boxes = np.tile(np.array([0, 0, 10, 10], np.float32), (n, 1))
    kps = np.zeros((n, 5, 2), np.float32)

    scores[5] = 0.9
    boxes[5] = [100, 100, 200, 220]
    kps[5] = [[110, 120]] * 5
    scores[9] = 0.8
    boxes[9] = [105, 105, 205, 225]  # heavy overlap with #5 → suppressed
    scores[17] = 0.7
    boxes[17] = [400, 100, 500, 200]  # separate face

    cfg = PipelineConfig(pre_nms_topk=32, max_faces=8, compute_dtype="float32")
    det = postprocess(
        jnp.asarray(scores), jnp.asarray(boxes), jnp.asarray(kps), 0.5, cfg
    )
    valid = np.asarray(det.valid)
    assert valid.sum() == 2
    got_boxes = np.asarray(det.boxes)[valid]
    # rescale by /0.5 → ×2 (reference :255-258)
    np.testing.assert_allclose(got_boxes[0], [200, 200, 400, 440], atol=1e-4)
    np.testing.assert_allclose(got_boxes[1], [800, 200, 1000, 400], atol=1e-4)
    np.testing.assert_allclose(np.asarray(det.scores)[valid], [0.9, 0.7], atol=1e-6)
    np.testing.assert_allclose(np.asarray(det.kps)[valid][0][0], [220, 240], atol=1e-4)


def test_detect_program_runs_end_to_end(det_params_cal, rng):
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    fn = jax.jit(lambda im: detect_program(det_params_cal, im, CFG))
    det = fn(jnp.asarray(img))
    assert det.boxes.shape == (CFG.max_faces, 4)
    assert det.valid.dtype == jnp.bool_
    valid = np.asarray(det.valid)
    scores = np.asarray(det.scores)
    # structural invariants (random weights → arbitrary detection count):
    # valid slots packed first, all scores above threshold, padding zeroed
    n = int(valid.sum())
    assert valid[:n].all() and not valid[n:].any()
    assert (scores[:n] > CFG.score_threshold).all()
    np.testing.assert_array_equal(scores[n:], 0.0)
    assert np.isfinite(np.asarray(det.boxes)).all()
    # determinism: same frame → identical detections
    det2 = fn(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(det2.boxes), np.asarray(det.boxes))


def test_bn_fold_parity(det_params_cal, rng):
    """SCRFD BNs are ALL post-conv → the entire net folds exactly
    (models/scrfd.fold_inference_params)."""
    folded = scrfd.fold_inference_params(det_params_cal)
    assert scrfd.infer_variant(folded) == "500m"
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        o0 = scrfd.apply(det_params_cal, x)
        o1 = scrfd.apply(folded, x)
    for s in o0:
        for a, b in zip(o0[s], o1[s]):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(np.abs(a).max(), 1.0)
            assert np.abs(a - b).max() < 1e-4 * scale, f"stride {s}"


def test_s2d_variant_contract(rng):
    """500m_s2d: stride-4 space-to-depth stem preserves the output
    contract (same strides/anchors/shapes as 500m) and BN-folds."""
    p = scrfd.init_params(jax.random.PRNGKey(2), variant="500m_s2d")
    assert scrfd.infer_variant(p) == "500m_s2d"
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    outs = scrfd.apply(p, x)
    for s in (8, 16, 32):
        n = (128 // s) ** 2 * scrfd.NUM_ANCHORS
        assert outs[s][0].shape == (1, n, 1)
        assert outs[s][1].shape == (1, n, 4)
        assert outs[s][2].shape == (1, n, 10)
    folded = scrfd.fold_inference_params(p)
    o2 = scrfd.apply(folded, x)
    with jax.default_matmul_precision("highest"):
        o1 = scrfd.apply(p, x)
        o2 = scrfd.apply(folded, x)
    for s in o1:
        for a, b in zip(o1[s], o2[s]):
            assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-3
    # ~500M-FLOP-class param count stays in family
    assert 0.3e6 < scrfd.num_params(p) < 1.5e6
