"""Fixed-shape greedy NMS for XLA (static shapes, masked loop).

The reference's NMS (src/face_detector.cpp:356-384) sorts by descending
score and greedily suppresses later boxes with IoU > threshold, where a
suppressed box never suppresses others. Dynamic vectors don't exist
under jit, so the same greedy semantics run as a fori_loop over a
fixed-K score-sorted candidate set with a keep mask; padded slots carry
score -inf and are never kept.

The reference computes IoU on integer-truncated rects (cv::Rect of
ints, src/face_detector.cpp:260-265,340-354). `int_rects=True`
reproduces that exactly on device: x=trunc(x1), y=trunc(y1),
w=trunc(x2-x1), h=trunc(y2-y1), rect=(x, y, x+w, y+h) — truncation
toward zero like a C int cast. Survivors then match the host C++
oracle (runtime/native.py frt_nms(int_rects=1)) bit-exactly.
`int_rects=False` keeps full float IoU (strictly more accurate).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax


def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between (N, 4) and (M, 4) x1,y1,x2,y2 boxes → (N, M)."""
    ax1, ay1, ax2, ay2 = (boxes_a[:, i] for i in range(4))
    bx1, by1, bx2, by2 = (boxes_b[:, i] for i in range(4))
    ix1 = jnp.maximum(ax1[:, None], bx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], by1[None, :])
    ix2 = jnp.minimum(ax2[:, None], bx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.maximum(ix2 - ix1, 0.0)
    ih = jnp.maximum(iy2 - iy1, 0.0)
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def _int_rects(boxes: jnp.ndarray) -> jnp.ndarray:
    """Integer-truncated rects, reference semantics
    (src/face_detector.cpp:260-265: cv::Rect((int)x1, (int)y1,
    (int)(x2-x1), (int)(y2-y1)))."""
    x1 = jnp.trunc(boxes[:, 0])
    y1 = jnp.trunc(boxes[:, 1])
    w = jnp.trunc(boxes[:, 2] - boxes[:, 0])
    h = jnp.trunc(boxes[:, 3] - boxes[:, 1])
    return jnp.stack([x1, y1, x1 + w, y1 + h], axis=-1)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
    assume_sorted: bool = False,
    int_rects: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS over a fixed-size candidate set.

    boxes: (K, 4) x1,y1,x2,y2; scores: (K,); valid: optional (K,) bool.
    assume_sorted=True skips re-sorting when the caller already provides
    descending-score order (e.g. straight out of lax.top_k).
    Returns (boxes, scores, keep, order) where boxes/scores are sorted by
    descending score, keep is the (K,) survivor mask in that order, and
    order holds the original indices (for gathering side data).

    Exact greedy semantics, computed as a FIXPOINT instead of K
    sequential steps: iterate keep[i] = no kept higher-scoring box
    overlaps i until unchanged. Each iteration is one (K, K) masked
    matvec on the VPU; convergence takes the length of the longest
    suppression chain (2-4 for real face layouts), so the sequential
    depth collapses from K to ~4 with bit-identical survivors (the
    fixpoint of that operator IS the greedy solution — induction on
    score rank: row i is final once rows < i are final).
    """
    K = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((K,), bool)
    neg_inf = jnp.float32(-jnp.inf)
    masked_scores = jnp.where(valid, scores, neg_inf)
    if assume_sorted:
        order = jnp.arange(K)
        boxes_s, scores_s, valid_s = boxes, masked_scores, valid
    else:
        order = jnp.argsort(-masked_scores)
        boxes_s = boxes[order]
        scores_s = masked_scores[order]
        valid_s = valid[order]

    iou_boxes = _int_rects(boxes_s) if int_rects else boxes_s
    iou = iou_matrix(iou_boxes, iou_boxes)
    # suppressor[j, i]: j ranks strictly above i and overlaps it
    suppressor = jnp.triu(iou > iou_threshold, k=1)

    def cond(state):
        keep, changed = state
        return changed

    def body(state):
        keep, _ = state
        new_keep = valid_s & ~jnp.any(suppressor & keep[:, None], axis=0)
        return new_keep, jnp.any(new_keep != keep)

    # initial `changed` is derived from valid_s (always True) so its
    # varying-manual-axes match the body output under shard_map
    changed0 = jnp.any(valid_s) | jnp.asarray(True)
    keep, _ = lax.while_loop(cond, body, (valid_s, changed0))
    return boxes_s, scores_s, keep, order
