"""SCRFD anchor-free decode across stride-8/16/32 heads.

This is the component the reference SKIPPED: it reads only output[0]
and assumes pre-decoded absolute boxes (reference:
src/face_detector.cpp:204-243, "简化的处理" comment), so it never
generates anchor centers or converts distances. We implement the real
InsightFace SCRFD semantics (BASELINE.json north star):

  centers: (x, y) = (ix, iy) * stride, row-major over the H×W grid,
           repeated num_anchors times per location (interleaved)
  bbox:    x1 = cx - l*s, y1 = cy - t*s, x2 = cx + r*s, y2 = cy + b*s
  kps:     px_i = cx + dx_i*s, py_i = cy + dy_i*s

Everything is static-shape: for a 640 input the concatenated anchor set
is 2*(80² + 40² + 20²) = 16800 rows.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def anchor_centers(input_size: int, stride: int, num_anchors: int = 2) -> np.ndarray:
    """(H*W*num_anchors, 2) anchor center pixels for one stride level.

    Row-major (y outer, x inner), anchor index fastest — matching the
    head's NHWC reshape in models/scrfd.py.
    """
    hw = input_size // stride
    xs, ys = np.meshgrid(np.arange(hw), np.arange(hw))  # xs varies fastest
    centers = np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.float32) * stride
    centers = np.repeat(centers, num_anchors, axis=0)
    return centers


def distance2bbox(points: jnp.ndarray, distance: jnp.ndarray) -> jnp.ndarray:
    """(…, 2) centers + (…, 4) l,t,r,b distances → (…, 4) x1,y1,x2,y2."""
    x1 = points[..., 0] - distance[..., 0]
    y1 = points[..., 1] - distance[..., 1]
    x2 = points[..., 0] + distance[..., 2]
    y2 = points[..., 1] + distance[..., 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2kps(points: jnp.ndarray, distance: jnp.ndarray) -> jnp.ndarray:
    """(…, 2) centers + (…, 2K) offsets → (…, K, 2) keypoints."""
    k = distance.shape[-1] // 2
    d = distance.reshape(*distance.shape[:-1], k, 2)
    return d + points[..., None, :]


def decode_outputs(
    outputs: Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    input_size: int,
    num_anchors: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode {stride: (scores, bbox, kps)} → flat anchors.

    scores (B, N), boxes (B, N, 4), kps (B, N, 5, 2) in letterboxed-input
    pixels, N = Σ_s num_anchors*(input/s)². Distances arrive in stride
    units (models/scrfd.py contract) and are scaled here.
    """
    all_scores, all_boxes, all_kps = [], [], []
    for stride in sorted(outputs.keys()):
        scores, bbox, kps = outputs[stride]
        centers = jnp.asarray(anchor_centers(input_size, stride, num_anchors))
        all_scores.append(scores[..., 0])
        all_boxes.append(distance2bbox(centers, bbox * stride))
        all_kps.append(distance2kps(centers, kps * stride))
    return (
        jnp.concatenate(all_scores, axis=-1),
        jnp.concatenate(all_boxes, axis=-2),
        jnp.concatenate(all_kps, axis=-3),
    )
