"""Batched gallery enrollment (BASELINE.json config 3: 256-image gallery
→ 512-d embedding bank, align+embed batched).

The reference has no enrollment concept at all (closest analog: the
webcam 's' key storing one feature, src/main.cpp:253-256). Here, all
images' best faces are aligned per-image (shape-bucketed detect/align
programs) and embedded in ONE data-parallel batched program over the
mesh (parallel/sharded_ops.sharded_batch_embed).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.match.gallery import GalleryBank


def _bucket_detect_align(detector, names, images, cfg):
    """Shape-bucketed batched detect + batched align.

    Images are grouped by (H, W): each group runs ONE batched
    letterbox→detect program and ONE batched align program on the
    ORIGINAL-resolution frames (full alignment quality — the letterboxed
    frame is only used for detection, like the reference which detects
    at 640 but aligns at source resolution, src/face_recognizer.cpp:93).
    Returns (kept_names, crops (N, S, S, 3) u8, kept_kps (N, 5, 2)
    source-resolution landmarks — the routing signal for the
    expert-parallel enroll path).
    """
    from facerecognizeonnx_tpu.detect.pipeline import detect_batch_program
    from facerecognizeonnx_tpu.embed.pipeline import align_faces_batch
    from facerecognizeonnx_tpu.ops.image import letterbox

    buckets = {}
    for i, img in enumerate(images):
        buckets.setdefault(img.shape, []).append(i)

    size = cfg.det_input_size

    @functools.lru_cache(maxsize=16)
    def programs(shape):
        def detect_bucket(frames):
            padded, scale = jax.vmap(lambda f: letterbox(f, size))(frames)
            dets = detect_batch_program(detector.params, padded, cfg)
            return dets, scale

        def align_bucket(frames, kps, boxes):
            return align_faces_batch(frames, kps, boxes, cfg)

        return jax.jit(detect_bucket), jax.jit(align_bucket)

    kept_names: List[str] = []
    crops: List[np.ndarray] = []
    kept_kps: List[np.ndarray] = []
    for shape, idxs in buckets.items():
        frames = np.stack([images[i] for i in idxs])
        detect_fn, align_fn = programs(shape)
        dets, scale = detect_fn(jnp.asarray(frames))
        valid = np.asarray(dets.valid[:, 0])
        inv_scale = (1.0 / np.asarray(scale))[:, None]
        # best face per image (slot 0 — postprocess compacts by score),
        # rescaled from letterboxed to source pixels (/scale, reference
        # src/face_detector.cpp:255-258)
        boxes = np.asarray(dets.boxes[:, 0]) * inv_scale
        kps = np.asarray(dets.kps[:, 0]) * inv_scale[..., None]
        batch_crops = np.asarray(
            align_fn(
                jnp.asarray(frames),
                jnp.asarray(kps[:, None]),
                jnp.asarray(boxes[:, None]),
            )
        )[:, 0]
        for j, i in enumerate(idxs):
            if valid[j]:
                kept_names.append(names[i])
                crops.append(batch_crops[j].astype(np.uint8))
                kept_kps.append(kps[j])
    return kept_names, crops, kept_kps


def enroll_batch(
    detector,
    recognizer,
    names: Sequence[str],
    images: Sequence[np.ndarray],
    bank: Optional[GalleryBank] = None,
    cfg: Optional[PipelineConfig] = None,
    mesh=None,
    experts: Optional[Sequence] = None,
    expert_router=None,
) -> Tuple[GalleryBank, List[str]]:
    """Detect the best face per image, align all, embed as one batch.

    Detection and alignment are shape-bucketed BATCHED programs (one
    dispatch per distinct image shape, not per image); all crops embed
    in ONE data-parallel program (parallel/sharded_ops). Returns
    (bank, enrolled_names) — images with no detected face are skipped
    (reported by omission from enrolled_names).

    experts: a list of E same-architecture recognizer param pytrees
    (per-pose/per-camera fine-tunes). Each crop is routed to ONE
    specialist by `expert_router(kps, E) -> int ids` (default:
    parallel.expert_parallel.route_by_yaw on the detected landmarks)
    and embedded by it through the expert-parallel dispatch/combine
    program (one expert resident per shard of the mesh's "expert"
    axis; capacity overflow recovered by the rerun policy, so every
    kept face gets its specialist's feature). `recognizer` is unused
    on this path. The reference embeds everything with one model
    (src/main.cpp:281); this is the production multi-specialist form.
    CLI: `enroll --experts w1.npz,w2.npz`.
    """
    cfg = cfg or detector.cfg
    bank = bank or GalleryBank(cfg.feature_dim)

    kept_names, crops, kept_kps = _bucket_detect_align(
        detector, names, images, cfg
    )
    if not crops:
        return bank, []

    if experts is not None:
        from facerecognizeonnx_tpu.parallel.expert_parallel import (
            ep_embed_crops,
            route_by_yaw,
        )

        router = expert_router or route_by_yaw
        ids = np.asarray(router(np.stack(kept_kps), len(experts)))
        feats, routed = ep_embed_crops(
            list(experts), ids, np.stack(crops), cfg, mesh=mesh
        )
        # overflow="rerun" routes every valid id; a False here would be
        # a router bug (id outside [0, E)) — surface it, never enroll a
        # zero feature silently
        if not routed.all():
            bad = int((~routed).sum())
            raise ValueError(
                f"expert router produced {bad} unroutable ids "
                f"(outside [0, {len(experts)}))"
            )
        feats = np.asarray(feats)
    else:
        from facerecognizeonnx_tpu.parallel.sharded_ops import (
            sharded_batch_embed,
        )

        feats = np.asarray(
            sharded_batch_embed(
                recognizer.params, np.stack(crops), cfg, mesh=mesh
            )
        )
    bank.add_batch(kept_names, feats)
    return bank, kept_names


def detect_align_crops(
    detector,
    images: Sequence[np.ndarray],
    cfg: Optional[PipelineConfig] = None,
    max_crops: int = 64,
) -> np.ndarray:
    """Detect + align the best face of each image → (N, S, S, 3) u8
    crops (N ≤ max_crops; images with no face are dropped). The
    CLI --quant-calib path uses this so int8 activation scales calibrate
    on REAL aligned faces instead of synthetic noise
    (FaceRecognizer.quantize's calib_crops parameter)."""
    cfg = cfg or detector.cfg
    names = [str(i) for i in range(len(images))]
    _, crops, _ = _bucket_detect_align(detector, names, list(images), cfg)
    if not crops:
        return np.zeros((0, cfg.rec_input_size, cfg.rec_input_size, 3), np.uint8)
    return np.stack(crops[:max_crops])
