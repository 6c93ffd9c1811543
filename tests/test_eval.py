"""Verification-protocol eval (train/eval.py) tests."""

import numpy as np
import pytest

from facerecognizeonnx_tpu.train.eval import (
    evaluate_pairs,
    pair_similarities,
    tar_at_far,
    verification_accuracy,
)


def _synthetic_pairs(rng, n=200, sep=0.9):
    """Genuine pairs share a class center, impostors don't; `sep`
    controls the margin (1.0 = perfectly separable)."""
    d = 64
    centers = rng.normal(size=(n, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    noise = lambda: rng.normal(scale=(1 - sep), size=(n, d)).astype(np.float32)
    f1 = centers + noise()
    same = np.arange(n) % 2 == 0
    other = centers[::-1]  # unrelated centers for impostor pairs
    f2 = np.where(same[:, None], centers + noise(), other + noise())
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    f2 /= np.linalg.norm(f2, axis=1, keepdims=True)
    return f1, f2, same


def test_pair_similarities_scale(rng):
    f = rng.normal(size=(5, 16)).astype(np.float32)
    f /= np.linalg.norm(f, axis=1, keepdims=True)
    sims = pair_similarities(f, f)
    np.testing.assert_allclose(sims, 1.0, atol=1e-6)  # self = (1+1)/2
    sims = pair_similarities(f, -f)
    np.testing.assert_allclose(sims, 0.0, atol=1e-6)  # opposite = 0


def test_separable_pairs_score_high(rng):
    f1, f2, same = _synthetic_pairs(rng, sep=0.95)
    sims = pair_similarities(f1, f2)
    out = verification_accuracy(sims, same)
    assert out["accuracy"] > 0.95
    assert 0.0 < out["best_threshold"] < 1.0
    t = tar_at_far(sims, same, far=1e-2)
    assert t["tar"] > 0.9


def test_tar_at_far_achieved_far_is_pinned(rng):
    """The returned threshold must admit EXACTLY floor(far*n) impostors
    strictly above it — the round-2 off-by-one (ceil selected the max
    impostor at far=1e-3, n=1000, admitting m-1) regressed silently
    because only `tar` was asserted. Pin the achieved FAR itself."""
    for n, far in [(1000, 1e-3), (1000, 1e-2), (500, 4e-3), (250, 1e-2)]:
        neg = rng.normal(size=n).astype(np.float32)
        pos = neg.max() + 1.0 + rng.random(50).astype(np.float32)
        sims = np.concatenate([pos, neg])
        same = np.concatenate([np.ones(50, bool), np.zeros(n, bool)])
        out = tar_at_far(sims, same, far=far)
        admitted = int((neg > out["threshold"]).sum())
        assert admitted == int(np.floor(far * n)), (
            f"far={far} n={n}: {admitted} impostors above threshold, "
            f"expected floor(far*n)={int(np.floor(far * n))}"
        )
        assert out["tar"] == 1.0  # all genuines sit above every impostor


def test_random_pairs_score_chance(rng):
    n = 400
    f1 = rng.normal(size=(n, 64)).astype(np.float32)
    f2 = rng.normal(size=(n, 64)).astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=1, keepdims=True)
    f2 /= np.linalg.norm(f2, axis=1, keepdims=True)
    same = rng.random(n) < 0.5
    out = verification_accuracy(pair_similarities(f1, f2), same)
    assert 0.35 < out["accuracy"] < 0.65  # chance level

def test_threshold_never_tuned_on_test_fold(rng):
    """A single outlier pair can only influence the folds it is NOT in:
    with 2 folds, moving one pair's sim must not change the other fold's
    selected threshold's evaluation data."""
    sims = np.concatenate([np.full(50, 0.8), np.full(50, 0.3)])
    same = np.concatenate([np.ones(50, bool), np.zeros(50, bool)])
    out = verification_accuracy(sims, same, n_folds=5)
    assert out["accuracy"] == 1.0
    assert 0.3 < out["best_threshold"] < 0.8


def test_evaluate_pairs_end_to_end(rng):
    """Drive with a toy embed_fn (mean-pool embedding of the image)."""
    def embed_fn(imgs):
        f = imgs.reshape(imgs.shape[0], -1).astype(np.float32) - 127.5
        return f / np.linalg.norm(f, axis=1, keepdims=True)

    base = rng.integers(0, 256, (20, 8, 8, 3)).astype(np.uint8)
    jit1 = np.clip(base.astype(np.int32) + rng.integers(-5, 5, base.shape), 0, 255)
    other = rng.integers(0, 256, (20, 8, 8, 3)).astype(np.uint8)
    same = np.arange(20) % 2 == 0
    imgs2 = np.where(same[:, None, None, None], jit1, other).astype(np.uint8)
    out = evaluate_pairs(embed_fn, base, imgs2, same, n_folds=4)
    assert set(out) >= {"accuracy", "best_threshold", "tar_at_far_0.01"}
    assert out["accuracy"] > 0.7  # toy embedding separates jittered copies


# --------------------------------------------------- detection AP


def test_box_iou_matrix_basic():
    from facerecognizeonnx_tpu.train.eval import box_iou_matrix

    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]], np.float32)
    iou = box_iou_matrix(a, b)[0]
    assert abs(iou[0] - 1.0) < 1e-6
    assert abs(iou[1] - (50.0 / 150.0)) < 1e-6
    assert iou[2] == 0.0


def test_detection_ap_perfect_and_misses():
    from facerecognizeonnx_tpu.train.eval import detection_average_precision

    gt = np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
    perfect = [{"boxes": gt, "scores": np.array([0.9, 0.8]), "gt": gt}]
    r = detection_average_precision(perfect)
    assert r["ap"] == 1.0 and r["recall"] == 1.0 and r["n_gt"] == 2

    # one hit + one duplicate (FP) + one miss
    dets = [{
        "boxes": np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32),
        "scores": np.array([0.9, 0.8], np.float32),
        "gt": gt,
    }]
    r = detection_average_precision(dets)
    assert r["recall"] == 0.5  # second GT never matched
    assert r["n_det"] == 2
    assert 0.0 < r["ap"] <= 0.5

    empty = detection_average_precision([{"boxes": np.zeros((0, 4)),
                                          "scores": np.zeros(0), "gt": gt}])
    assert empty["ap"] == 0.0


def test_detection_ap_score_ordering_matters():
    """A high-scoring FP before the TPs drags AP below precision@end."""
    from facerecognizeonnx_tpu.train.eval import detection_average_precision

    gt = np.array([[0, 0, 10, 10]], np.float32)
    dets = [{
        "boxes": np.array([[50, 50, 60, 60], [0, 0, 10, 10]], np.float32),
        "scores": np.array([0.95, 0.9], np.float32),
        "gt": gt,
    }]
    r = detection_average_precision(dets)
    assert abs(r["ap"] - 0.5) < 1e-6  # TP arrives at rank 2 -> p=1/2 at r=1
