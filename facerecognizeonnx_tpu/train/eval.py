"""Verification-protocol evaluation (LFW-style) for embedding models.

The reference demo ships no accuracy tooling — its notion of quality is
the compare verdict at threshold 0.6 (reference src/main.cpp:118-123).
A training framework needs the standard face-verification protocol the
w600k models are scored with: k-fold cross-validated accuracy with the
threshold selected on held-out folds, plus TAR@FAR operating points.

All similarities use the framework's (cos+1)/2 scale
(src/face_recognizer.cpp:333) so thresholds here are directly
comparable to the CLI/API match threshold.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def pair_similarities(feats1: np.ndarray, feats2: np.ndarray) -> np.ndarray:
    """(N, D) x (N, D) L2-normalized embeddings → (N,) similarities on
    the (cos+1)/2 scale."""
    f1 = np.asarray(feats1, np.float32)
    f2 = np.asarray(feats2, np.float32)
    return ((f1 * f2).sum(axis=-1) + 1.0) / 2.0


def _accuracy(sims: np.ndarray, same: np.ndarray, thr: float) -> float:
    pred = sims > thr
    return float((pred == same).mean())


def verification_accuracy(
    sims: Sequence[float],
    same: Sequence[bool],
    n_folds: int = 10,
    thresholds: np.ndarray | None = None,
) -> Dict[str, float]:
    """K-fold cross-validated verification accuracy.

    For each fold: pick the threshold maximizing accuracy on the OTHER
    folds, score it on this fold — the threshold is never tuned on the
    data it is scored on (standard LFW protocol).

    Returns {"accuracy", "accuracy_std", "best_threshold"} — the
    threshold is the mean of the per-fold selections, usable directly
    as a `match_threshold` config value.
    """
    sims = np.asarray(sims, np.float32)
    same = np.asarray(same, bool)
    assert sims.shape == same.shape and sims.ndim == 1
    n = sims.shape[0]
    assert n >= n_folds, f"need >= {n_folds} pairs, have {n}"
    if thresholds is None:
        thresholds = np.arange(0.0, 1.0001, 0.0025, dtype=np.float32)

    folds = np.array_split(np.arange(n), n_folds)
    accs, thrs = [], []
    for fold in folds:
        test_mask = np.zeros(n, bool)
        test_mask[fold] = True
        train_s, train_y = sims[~test_mask], same[~test_mask]
        fold_accs = [(thr, _accuracy(train_s, train_y, thr)) for thr in thresholds]
        best_thr = max(fold_accs, key=lambda t: t[1])[0]
        accs.append(_accuracy(sims[test_mask], same[test_mask], best_thr))
        thrs.append(best_thr)
    return {
        "accuracy": float(np.mean(accs)),
        "accuracy_std": float(np.std(accs)),
        "best_threshold": float(np.mean(thrs)),
    }


def tar_at_far(
    sims: Sequence[float], same: Sequence[bool], far: float = 1e-3
) -> Dict[str, float]:
    """True-accept rate at a fixed false-accept rate.

    The threshold is the (1-far) quantile of the IMPOSTOR similarity
    distribution; TAR is the fraction of genuine pairs above it.
    """
    sims = np.asarray(sims, np.float32)
    same = np.asarray(same, bool)
    neg = np.sort(sims[~same])
    pos = sims[same]
    assert neg.size > 0 and pos.size > 0, "need both genuine and impostor pairs"
    k = min(neg.size - 1, int(np.ceil((1.0 - far) * neg.size)))
    thr = float(neg[k])
    return {
        "tar": float((pos > thr).mean()),
        "far": far,
        "threshold": thr,
    }


def evaluate_pairs(
    embed_fn,
    images1: np.ndarray,
    images2: np.ndarray,
    same: Sequence[bool],
    n_folds: int = 10,
) -> Dict[str, float]:
    """End-to-end: embed both sides with `embed_fn((N, S, S, 3) uint8
    BGR crops) -> (N, D) L2-normalized feats`, then run the protocol."""
    f1 = np.asarray(embed_fn(np.asarray(images1)))
    f2 = np.asarray(embed_fn(np.asarray(images2)))
    sims = pair_similarities(f1, f2)
    out = verification_accuracy(sims, same, n_folds=n_folds)
    out.update({f"tar_at_far_{far:g}": tar_at_far(sims, same, far)["tar"]
                for far in (1e-2, 1e-3)})
    return out
