"""Batched gallery enrollment (BASELINE.json config 3: 256-image gallery
→ 512-d embedding bank, align+embed batched).

The reference has no enrollment concept at all (closest analog: the
webcam 's' key storing one feature, src/main.cpp:253-256). Here, all
images' best faces are aligned per-image (shape-bucketed detect/align
programs) and embedded in ONE data-parallel batched program over the
mesh (parallel/sharded_ops.sharded_batch_embed).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.embed.pipeline import align_faces
from facerecognizeonnx_tpu.match.gallery import GalleryBank
from facerecognizeonnx_tpu.types import face_boxes_to_arrays


def enroll_batch(
    detector,
    recognizer,
    names: Sequence[str],
    images: Sequence[np.ndarray],
    bank: Optional[GalleryBank] = None,
    cfg: Optional[PipelineConfig] = None,
    mesh=None,
) -> Tuple[GalleryBank, List[str]]:
    """Detect the best face per image, align all, embed as one batch.

    Returns (bank, enrolled_names). Images with no detected face are
    skipped (reported by omission from enrolled_names).
    """
    cfg = cfg or detector.cfg
    bank = bank or GalleryBank(cfg.feature_dim)

    crops = []
    kept_names = []
    align_cache = {}
    for name, image in zip(names, images):
        faces = detector.detect(image)
        if not faces:
            continue
        dets = face_boxes_to_arrays(faces[:1], 1)
        key = image.shape
        if key not in align_cache:
            align_cache[key] = jax.jit(
                lambda img, kps, boxes: align_faces(img, kps, boxes, cfg)
            )
        crop = align_cache[key](
            jnp.asarray(image), jnp.asarray(dets.kps), jnp.asarray(dets.boxes)
        )[0]
        crops.append(np.asarray(crop, np.uint8))
        kept_names.append(name)

    if not crops:
        return bank, []

    from facerecognizeonnx_tpu.parallel.sharded_ops import sharded_batch_embed

    feats = np.asarray(
        sharded_batch_embed(recognizer.params, np.stack(crops), cfg, mesh=mesh)
    )
    bank.add_batch(kept_names, feats)
    return bank, kept_names
