"""Fixed-shape NMS parity vs a direct transcription of the reference's
greedy algorithm (src/face_detector.cpp:356-384, float-IoU variant)."""

import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.ops.nms import iou_matrix, nms_fixed


def greedy_nms_oracle(boxes, scores, thr):
    """Python transcription of the reference greedy NMS (float IoU)."""
    order = np.argsort(-scores, kind="stable")
    boxes = boxes[order]
    suppressed = np.zeros(len(boxes), bool)
    for i in range(len(boxes)):
        if suppressed[i]:
            continue
        for j in range(i + 1, len(boxes)):
            if suppressed[j]:
                continue
            ax1, ay1, ax2, ay2 = boxes[i]
            bx1, by1, bx2, by2 = boxes[j]
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            union = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
            if union > 0 and inter / union > thr:
                suppressed[j] = True
    return order, ~suppressed


def _random_boxes(rng, n):
    xy = rng.uniform(0, 500, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    return boxes, scores


def test_iou_matrix_basics():
    a = jnp.asarray([[0.0, 0, 10, 10]])
    b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    got = np.asarray(iou_matrix(a, b))[0]
    np.testing.assert_allclose(got, [1.0, 25 / 175, 0.0], atol=1e-6)


def test_nms_matches_greedy_oracle(rng):
    for trial in range(5):
        boxes, scores = _random_boxes(rng, 64)
        order_ref, keep_ref = greedy_nms_oracle(boxes, scores, 0.4)
        boxes_s, scores_s, keep, order = nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), 0.4
        )
        kept_ref = set(map(tuple, boxes[order_ref][keep_ref]))
        kept_got = set(map(tuple, np.asarray(boxes_s)[np.asarray(keep)]))
        assert kept_ref == kept_got


def test_nms_respects_valid_mask(rng):
    boxes, scores = _random_boxes(rng, 16)
    valid = np.zeros(16, bool)
    valid[:4] = True
    _, scores_s, keep, _ = nms_fixed(
        jnp.asarray(boxes), jnp.asarray(scores), 0.4, valid=jnp.asarray(valid)
    )
    keep = np.asarray(keep)
    assert keep.sum() <= 4
    # padding slots sorted last with -inf scores and never kept
    assert not keep[4:].any()


def test_nms_assume_sorted_matches_unsorted(rng):
    boxes, scores = _random_boxes(rng, 32)
    order = np.argsort(-scores, kind="stable")
    b1, s1, k1, _ = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.4)
    b2, s2, k2, _ = nms_fixed(
        jnp.asarray(boxes[order]), jnp.asarray(scores[order]), 0.4,
        assume_sorted=True,
    )
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b2))


def test_nms_long_suppression_chain_exact():
    """Pathological alternating chain — the fixpoint iteration must still
    match greedy exactly (worst case for convergence count)."""
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    for i in range(n):
        # adjacent IoU = 60/140 ≈ 0.43 > 0.3; next-but-one ≈ 0.11 < 0.3
        boxes[i] = [i * 4.0, 0, i * 4.0 + 10.0, 10.0]
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    order_ref, keep_ref = greedy_nms_oracle(boxes, scores, 0.3)
    _, _, keep, order = nms_fixed(jnp.asarray(boxes), jnp.asarray(scores), 0.3)
    got = np.asarray(keep)
    expect = np.zeros(n, bool)
    expect[order_ref[keep_ref]] = True
    got_orig = np.zeros(n, bool)
    got_orig[np.asarray(order)[got]] = True
    np.testing.assert_array_equal(got_orig, expect)
    # alternating pattern: every other box survives
    assert got_orig[::2].all() and not got_orig[1::2].any()


def test_nms_suppressed_box_does_not_suppress():
    # Classic chain: A (0.9) overlaps B (0.8) overlaps C (0.7); A∩C empty.
    # Greedy: A kills B; B (dead) must NOT kill C.
    # A-B IoU = 60/140 ≈ 0.43, B-C ≈ 0.43, A-C = 20/180 ≈ 0.11
    boxes = jnp.asarray(
        [[0.0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    _, _, keep, _ = nms_fixed(boxes, scores, 0.3)
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_int_rects_device_matches_cpp_oracle(rng):
    """Device NMS int_rects mode == reference-semantics C++ oracle
    (frt_nms int_rects=1) bit-exactly, on random AND near-threshold
    boxes (VERDICT r1 item 4; reference src/face_detector.cpp:340-384)."""
    from facerecognizeonnx_tpu.runtime.native import native_available, nms_native

    if not native_available():
        import pytest

        pytest.skip("native runtime not built")

    # random boxes with fractional coords so truncation actually matters
    xy = rng.uniform(0, 300, (64, 2))
    wh = rng.uniform(3, 80, (64, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, 64).astype(np.float32)
    # plus engineered pairs that straddle IoU 0.4 ONLY under truncation:
    # float IoU ~0.403 > 0.4 but int-rect IoU ~0.398 <= 0.4
    near = np.array(
        [
            [100.0, 100.0, 120.9, 120.9],  # 20.9 x 20.9
            [106.0, 100.0, 126.9, 120.9],  # shifted 6px: float IoU .403
            [200.6, 200.6, 230.5, 230.5],
            [200.0, 200.0, 229.9, 229.9],
        ],
        np.float32,
    )
    near_scores = np.array([0.99, 0.98, 0.97, 0.96], np.float32)
    boxes = np.concatenate([boxes, near])
    scores = np.concatenate([scores, near_scores])

    for thr in (0.4, 0.3, 0.03):
        _, _, keep, order = nms_fixed(
            jnp.asarray(boxes), jnp.asarray(scores), thr, int_rects=True
        )
        got = np.zeros(len(boxes), bool)
        got[np.asarray(order)[np.asarray(keep)]] = True
        ref = nms_native(boxes, scores, thr, int_rects=True)
        np.testing.assert_array_equal(got, ref, err_msg=f"thr={thr}")
        # sanity: at 0.4 the engineered pairs must split float vs int
        if thr == 0.4:
            _, _, keep_f, order_f = nms_fixed(
                jnp.asarray(boxes), jnp.asarray(scores), thr, int_rects=False
            )
            got_f = np.zeros(len(boxes), bool)
            got_f[np.asarray(order_f)[np.asarray(keep_f)]] = True
            assert not (got_f == got).all(), "fixtures did not straddle"
