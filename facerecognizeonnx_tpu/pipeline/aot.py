"""AOT export of the fused pipeline (jax.export / StableHLO).

The reference's deployment unit is an .onnx file + ONNX Runtime session
(reference src/face_detector.cpp:20-90 loads + optimizes per process
start). The TPU-native analog: trace + lower the fused frames→features
program ONCE, serialize the StableHLO artifact to disk, and let serving
processes load it without retracing Python — jax.export artifacts are
versioned, platform-checked, and load in milliseconds (XLA still
compiles natively per chip type, amortized by the persistent
compilation cache).

The weights are BAKED into the artifact as constants (like the .onnx
file the reference ships); use `export_fused` per weight snapshot.
"""

from __future__ import annotations

import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from facerecognizeonnx_tpu.config import PipelineConfig


def export_fused(
    det_params,
    arc_params,
    cfg: PipelineConfig,
    batch: int,
    max_faces_embed: int = 8,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the fused detect→align→embed program for a fixed frame
    batch shape. Returns the artifact bytes (caller persists them)."""
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    def fn(frames_u8):
        dets, feats = frames_to_features(
            det_params, arc_params, frames_u8, cfg, max_faces_embed
        )
        return dets.boxes, dets.scores, dets.kps, dets.valid, feats

    size = cfg.det_input_size
    spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.uint8)
    exported = jax.export.export(
        jax.jit(fn), platforms=list(platforms) if platforms else None
    )(spec)
    return exported.serialize()


def save_fused(path: str, *args, **kwargs) -> str:
    data = export_fused(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_fused(path_or_bytes) -> Callable:
    """Load a serialized artifact → callable
    frames_u8 (B, S, S, 3) → (boxes, scores, kps, valid, feats).

    Raises ModelLoadError on a missing/corrupt artifact."""
    from facerecognizeonnx_tpu.errors import ModelLoadError

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        try:
            with open(path_or_bytes, "rb") as f:
                data = f.read()
        except OSError as e:
            raise ModelLoadError(f"cannot read AOT artifact: {e}") from e
    try:
        exported = jax.export.deserialize(data)
    except Exception as e:
        raise ModelLoadError(f"corrupt AOT artifact: {e}") from e
    return jax.jit(exported.call)
