"""Central configuration for the TPU face pipeline.

The reference scatters its tunables across C++ defaults (reference:
src/face_detector.h:20 score 0.5 / NMS IoU 0.4; src/main.cpp:118 match
threshold 0.6; src/face_detector.cpp:8-9 640x640 detector input;
src/face_recognizer.cpp:8-10 112x112 input, 512-d features). Here they
live in one dataclass that every stage reads.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # --- detector (reference: src/face_detector.cpp:8-9, face_detector.h:20)
    det_input_size: int = 640
    score_threshold: float = 0.5
    nms_threshold: float = 0.4
    # SCRFD anchor layout: strides with 2 anchors per location
    # (InsightFace SCRFD decode semantics; the reference never implements
    # this decode — see SURVEY.md §2 quirk — we do the full version).
    strides: Tuple[int, ...] = (8, 16, 32)
    num_anchors: int = 2
    # Static-shape bounds: pre-NMS top-K candidates and max faces returned.
    pre_nms_topk: int = 512
    max_faces: int = 128
    # IoU on integer-truncated rects like the reference
    # (src/face_detector.cpp:260-265,340-354) — survivors then match the
    # reference bit-exactly. False = full float IoU (more accurate).
    nms_int_rects: bool = True

    # --- recognizer (reference: src/face_recognizer.cpp:8-10)
    rec_input_size: int = 112
    feature_dim: int = 512
    # w600k family member: iresnet18|34|50|100 (w600k_r50 = iresnet50) or
    # mbf|mbf_large (w600k_mbf, the buffalo_s/sc pack recognizer).
    rec_arch: str = "iresnet50"

    # w8a8 int8 PTQ for the recognizer ("none" | "w8a8"): int8 MXU convs
    # at 2x bf16 peak + half the activation HBM traffic (models/quant.py).
    # Optional: the 1e-3-cosine parity contract applies to the default
    # bf16 path only.
    recognizer_quant: str = "none"

    # --- matching (reference: src/main.cpp:118, src/face_recognizer.cpp:333)
    match_threshold: float = 0.6  # on the (cos+1)/2 scale

    # --- normalization (reference: src/face_detector.cpp:127-136)
    pixel_mean: float = 127.5
    pixel_scale: float = 128.0

    # --- TPU execution
    compute_dtype: str = "bfloat16"  # matmul/conv compute dtype on TPU
    # Letterbox on host (native C++) instead of on device: every input
    # resolution then hits ONE compiled 640x640 program instead of one
    # program per resolution (recompile-storm mitigation for
    # heterogeneous photo sets; SURVEY.md §7 hard parts).
    host_letterbox: bool = False
    scrfd_variant: str = "500m"  # 500m | 2.5g | 10g (det_* model family)
    # Alignment warp implementation:
    #   "gather" — exact cv2-bilinear parity (4 gather indices/pixel)
    #   "banded" — banded-gather + MXU interpolation matmuls (XLA)
    #   "pallas" — Mosaic kernel: per-face window DMA + MXU interpolation
    #              (ops/warp_pallas.py x-major, TPU only; 8.79 ms/256
    #              faces on v5e vs ~86 ms for the best gather form;
    #              ≤0.5-LSB p99 deviation vs "gather")
    warp_impl: str = "gather"
    # Run the Pallas warp in interpret mode (CPU emulation of the
    # Mosaic kernel). Lets CPU-mesh tests exercise the EXACT production
    # kernel path — including its interaction with shard_map, which the
    # portable "gather" warp can't stand in for (a shard_map replication
    # check rejected the kernel on real TPUs while every CPU test stayed
    # green). Never set in production; AOT export must keep this False
    # so the kernel lowers to its serialized Mosaic payload.
    warp_interpret: bool = False
    # Skip the alignment warp for UNOCCUPIED face slots in the fused
    # frames→features program (Pallas valid-skip: measured 0.70x warp
    # time at 2/8 occupancy, zero overhead when all slots are real).
    # Matches the reference, which only embeds detected faces
    # (src/main.cpp:226). bench.py sets False so the headline keeps
    # paying for all K slots regardless of detections (honesty contract).
    skip_invalid_faces: bool = True
    param_dtype: str = "float32"
    # Mesh axis names used by parallel/ and train/.
    data_axis: str = "data"
    model_axis: str = "model"

    # --- model weights
    detector_weights: Optional[str] = None  # .npz / orbax dir / .onnx
    recognizer_weights: Optional[str] = None
    seed: int = 0  # deterministic init when no weights are given


DEFAULT_CONFIG = PipelineConfig()


def auto_config(**overrides) -> PipelineConfig:
    """PipelineConfig tuned for the current backend: the Pallas warp
    kernel on TPU, the portable gather path elsewhere."""
    import jax

    try:
        on_tpu = jax.devices()[0].platform not in ("cpu",)
    except RuntimeError:
        on_tpu = False
    base = dict(warp_impl="pallas" if on_tpu else "gather")
    base.update(overrides)
    return PipelineConfig(**base)
