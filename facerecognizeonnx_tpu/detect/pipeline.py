"""Fused on-device detection pipeline.

One jit-compiled XLA program per input-shape bucket runs the whole
reference detect() call stack (SURVEY.md §3.1-3.2): letterbox →
normalize → SCRFD forward → anchor decode → score threshold → /scale
rescale → NMS → fixed-K detections. No pixel touches host between
input frame and the final boxes (the reference round-trips through
std::vector at every stage, src/face_detector.cpp:139-222).

Reference semantics preserved:
  - strict `score > threshold` filter      (src/face_detector.cpp:253)
  - coords rescaled by /scale to original  (:255-258, 271-272)
  - greedy NMS at IoU 0.4                  (:356-384)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.decode import decode_outputs
from facerecognizeonnx_tpu.models import scrfd
from facerecognizeonnx_tpu.ops.image import letterbox, normalize_to_rgb
from facerecognizeonnx_tpu.ops.nms import nms_fixed
from facerecognizeonnx_tpu.types import Detections


def _forward(params, x, dtype):
    """Dispatch: native SCRFD params pytree, or an OnnxRunner loaded from
    a real det_500m.onnx (onnx_import/importer.py) — same output contract."""
    if hasattr(params, "apply"):
        return params.apply(x, dtype)
    return scrfd.apply(params, x, compute_dtype=dtype)


def postprocess(
    scores: jnp.ndarray,
    boxes: jnp.ndarray,
    kps: jnp.ndarray,
    scale: float,
    cfg: PipelineConfig,
    score_threshold: float | None = None,
    nms_threshold: float | None = None,
) -> Detections:
    """Decoded anchors → fixed-K Detections, for ONE image.

    scores (N,), boxes (N, 4), kps (N, 5, 2) in letterboxed pixels.
    """
    score_thr = cfg.score_threshold if score_threshold is None else score_threshold
    nms_thr = cfg.nms_threshold if nms_threshold is None else nms_threshold

    mask = scores > score_thr  # strict >, reference :253
    ranked = jnp.where(mask, scores, -1.0)
    top_scores, idx = jax.lax.top_k(ranked, cfg.pre_nms_topk)
    top_boxes = boxes[idx] * (1.0 / scale)
    top_kps = kps[idx] * (1.0 / scale)
    valid = top_scores > score_thr

    # lax.top_k output is already descending → skip the re-sort in NMS
    boxes_s, scores_s, keep, order = nms_fixed(
        top_boxes, top_scores, nms_thr, valid, assume_sorted=True,
        int_rects=cfg.nms_int_rects,
    )
    kps_s = top_kps[order]

    # compact survivors to the front (stable sort keeps score order)
    sel = jnp.argsort(~keep, stable=True)[: cfg.max_faces]
    out_valid = keep[sel]
    return Detections(
        boxes=jnp.where(out_valid[:, None], boxes_s[sel], 0.0),
        scores=jnp.where(out_valid, scores_s[sel], 0.0),
        kps=jnp.where(out_valid[:, None, None], kps_s[sel], 0.0),
        valid=out_valid,
    )


def detect_program(
    params,
    image_u8: jnp.ndarray,
    cfg: PipelineConfig,
    score_threshold: float | None = None,
    nms_threshold: float | None = None,
    compute_dtype=None,
) -> Detections:
    """Full single-image detect: (H, W, 3) BGR uint8 → Detections.

    Trace-time static over the image shape; FaceDetector wraps it in a
    jax.jit cache keyed per shape bucket."""
    dtype = jnp.dtype(cfg.compute_dtype) if compute_dtype is None else compute_dtype
    padded, scale = letterbox(image_u8, cfg.det_input_size)
    x = normalize_to_rgb(padded, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)[None]
    outs = _forward(params, x, dtype)
    scores, boxes, kps = decode_outputs(outs, cfg.det_input_size, cfg.num_anchors)
    return postprocess(
        scores[0], boxes[0], kps[0], scale, cfg, score_threshold, nms_threshold
    )


def detect_batch_program(
    params,
    images_u8: jnp.ndarray,
    cfg: PipelineConfig,
    score_threshold: float | None = None,
    nms_threshold: float | None = None,
    compute_dtype=None,
) -> Detections:
    """Batched detect on pre-letterboxed frames.

    images_u8: (B, S, S, 3) BGR uint8 already letterboxed (e.g. a video
    pipeline feeding fixed-size frames); coords returned in letterboxed
    pixels (scale=1).
    """
    dtype = jnp.dtype(cfg.compute_dtype) if compute_dtype is None else compute_dtype
    x = normalize_to_rgb(images_u8, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
    outs = _forward(params, x, dtype)
    scores, boxes, kps = decode_outputs(outs, cfg.det_input_size, cfg.num_anchors)
    post = jax.vmap(
        lambda s, b, k: postprocess(
            s, b, k, 1.0, cfg, score_threshold, nms_threshold
        )
    )
    return post(scores, boxes, kps)


