"""Fused on-device alignment + embedding.

Reproduces the reference's extractFeature call stack (SURVEY.md §3.1:
alignFace → preprocess → Run → L2-normalize, src/face_recognizer.cpp:236-304)
as one batched XLA program: a whole frame's K faces align and embed in a
single dispatch, with the crop-fallback for degenerate landmark fits
expressed as an alternative affine matrix so both paths share the warp.

extractFeatureSimple (src/face_recognizer.cpp:152-234: whole-image
resize, no detect/align) is the `embed_simple_program`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import recognizer_apply
from facerecognizeonnx_tpu.models.layers import l2_normalize
from facerecognizeonnx_tpu.ops.image import normalize_to_rgb, resize_bilinear
from facerecognizeonnx_tpu.ops.umeyama import ARCFACE_DST_5PTS, umeyama
from facerecognizeonnx_tpu.ops.warp import crop_resize_affine, warp_affine_batch


def _align_matrices(kps, boxes, h, w, size):
    """Per-face warp matrices with the crop fallback selected in-graph."""
    M, valid = umeyama(kps, jnp.asarray(ARCFACE_DST_5PTS))
    clipped = jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0.0, w - 1.0),
            jnp.clip(boxes[..., 1], 0.0, h - 1.0),
            jnp.clip(boxes[..., 2], 1.0, float(w)),
            jnp.clip(boxes[..., 3], 1.0, float(h)),
        ],
        axis=-1,
    )
    M_fb = crop_resize_affine(clipped, size, size)
    return jnp.where(valid[..., None, None], M, M_fb)


def align_faces_batch(
    frames_u8: jnp.ndarray,
    kps: jnp.ndarray,
    boxes: jnp.ndarray,
    cfg: PipelineConfig,
    valid: jnp.ndarray | None = None,
    normalized: bool = False,
) -> jnp.ndarray:
    """Align K faces of each of B frames → (B, K, S, S, 3) in ONE gather.

    frames: (B, H, W, 3); kps: (B, K, 5, 2); boxes: (B, K, 4).

    normalized=True returns embed-ready (px-mean)/scale RGB instead of
    raw BGR u8-range crops — on the Pallas path this is FUSED into the
    warp kernel's epilogue (bf16 out, no separate normalize pass).
    valid (B, K) skips invalid faces' warp work entirely on the Pallas
    path (their crop slots are zeros); other impls mask after the warp.
    """
    size = cfg.rec_input_size
    h, w = frames_u8.shape[1], frames_u8.shape[2]
    M_sel = _align_matrices(kps, boxes, h, w, size)  # (B, K, 2, 3)
    if cfg.warp_impl == "pallas":  # TPU-only Mosaic kernel (fastest)
        from facerecognizeonnx_tpu.ops.warp_pallas import warp_affine_pallas

        return warp_affine_pallas(
            frames_u8.astype(jnp.uint8),
            M_sel,
            size,
            interpret=cfg.warp_interpret,
            layout="xmajor",
            epilogue=(cfg.pixel_mean, cfg.pixel_scale) if normalized else None,
            valid=valid,
        )
    if cfg.warp_impl == "banded":
        from facerecognizeonnx_tpu.ops.warp_banded import warp_affine_banded

        crops = warp_affine_banded(frames_u8.astype(jnp.uint8), M_sel, size)
    else:
        crops = warp_affine_batch(frames_u8, M_sel, size, size)
    if normalized:
        crops = normalize_to_rgb(crops, cfg.pixel_mean, cfg.pixel_scale)
    if valid is not None:
        # match the Pallas valid-skip contract: invalid slots are zeros
        # in the OUTPUT space (raw or normalized alike)
        crops = crops * valid[..., None, None, None].astype(crops.dtype)
    return crops


def align_faces(
    image_u8: jnp.ndarray,
    kps: jnp.ndarray,
    boxes: jnp.ndarray,
    cfg: PipelineConfig,
) -> jnp.ndarray:
    """Align K faces of one image to (K, 112, 112, 3) float BGR crops.

    kps: (K, 5, 2) landmarks; boxes: (K, 4) x1,y1,x2,y2 — used only by
    the fallback path when the similarity fit is degenerate, mirroring
    the reference (src/face_recognizer.cpp:116-127: crop box ∩ image,
    resize). Fallback boxes are pre-clipped to the image here.
    """
    return align_faces_batch(image_u8[None], kps[None], boxes[None], cfg)[0]


def embed_crops(
    params,
    crops_bgr: jnp.ndarray,
    cfg: PipelineConfig,
    compute_dtype=None,
    normalized: bool = False,
) -> jnp.ndarray:
    """(K, 112, 112, 3) BGR crops → (K, 512) L2-normalized features.

    normalized=True: crops are ALREADY (px-mean)/scale RGB (the warp
    kernel's fused epilogue emits them) — skip the normalize pass."""
    dtype = jnp.dtype(cfg.compute_dtype) if compute_dtype is None else compute_dtype
    if normalized:
        x = crops_bgr.astype(dtype)
    else:
        x = normalize_to_rgb(crops_bgr, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
    if hasattr(params, "apply"):  # OnnxRunner from a real w600k_*.onnx
        feats = params.apply(x, dtype)
    else:  # native IResNet or MobileFaceNet pytree (structure-dispatched)
        feats = recognizer_apply(params, x, compute_dtype=dtype)
    return l2_normalize(feats)


def embed_program(
    params,
    image_u8: jnp.ndarray,
    kps: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: PipelineConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """Frame + K detections → (K, 512) features; invalid slots → zeros.

    Zero features give compareFaces similarity (0+1)/2 = 0.5 … so invalid
    slots are zeroed to make misuse obvious, matching the reference's
    empty-vector return on failure (src/face_recognizer.cpp:254-257).
    """
    crops = align_faces_batch(
        image_u8[None], kps[None], boxes[None], cfg,
        valid=valid[None], normalized=True,
    )[0]
    feats = embed_crops(params, crops, cfg, compute_dtype, normalized=True)
    return feats * valid[:, None].astype(feats.dtype)


def embed_simple_program(
    params,
    image_u8: jnp.ndarray,
    cfg: PipelineConfig,
    compute_dtype=None,
) -> jnp.ndarray:
    """extractFeatureSimple: whole image → resize 112 → embed → (512,)."""
    size = cfg.rec_input_size
    resized = resize_bilinear(image_u8, size, size)
    feats = embed_crops(params, resized[None], cfg, compute_dtype)
    return feats[0]
