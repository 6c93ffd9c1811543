"""Named model packs — the InsightFace buffalo_* bundle layout.

The reference hardcodes ONE pack: buffalo_sc = det_500m.onnx +
w600k_r50.onnx in a models/ directory next to the binary (reference
src/main.cpp:269-270, models/README.md:28-30). Users of the buffalo
family pick a pack name and get a matched detector+recognizer; this
registry maps each pack to the framework's native architectures and to
the .onnx filenames the published bundles ship, so

    detector, recognizer = load_pack("buffalo_sc", model_dir="models/")

loads real weights when the files exist and deterministic-init native
models otherwise (the same fallback contract as FaceDetector.load_model
with no path, pipeline/api._load_weights).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple


@dataclass(frozen=True)
class Pack:
    """One buffalo bundle: detector variant + recognizer arch + the
    .onnx filenames the published pack directory contains."""

    det_variant: str
    rec_arch: str
    det_file: str
    rec_file: str
    note: str = ""


# buffalo_sc follows the REFERENCE's own definition (models/README.md:
# 28-30: det_500m + w600k_r50); the other rows are the published
# InsightFace model-zoo pack compositions.
PACKS: Dict[str, Pack] = {
    "buffalo_sc": Pack(
        "500m", "iresnet50", "det_500m.onnx", "w600k_r50.onnx",
        note="the reference's pack (models/README.md:28-30)",
    ),
    "buffalo_s": Pack(
        "500m", "mbf", "det_500m.onnx", "w600k_mbf.onnx",
        note="small: 500m detector + MobileFaceNet embedder",
    ),
    "buffalo_m": Pack(
        "2.5g", "iresnet50", "det_2.5g.onnx", "w600k_r50.onnx",
        note="medium: 2.5g detector + r50 embedder",
    ),
    "buffalo_l": Pack(
        "10g", "iresnet50", "det_10g.onnx", "w600k_r50.onnx",
        note="large: 10g detector + r50 embedder",
    ),
}


def pack_names() -> Tuple[str, ...]:
    return tuple(sorted(PACKS))


def resolve_pack(
    name: str, model_dir: Optional[str] = None
) -> Tuple[Pack, Optional[str], Optional[str]]:
    """(Pack, det_path-or-None, rec_path-or-None).

    Paths are returned only when the pack's files exist under
    model_dir; missing files mean deterministic-init native weights
    (exactly what the loaders do with path=None)."""
    if name not in PACKS:
        raise KeyError(
            f"unknown pack {name!r}; available: {', '.join(pack_names())}"
        )
    pack = PACKS[name]
    det_path = rec_path = None
    if model_dir:
        det = os.path.join(model_dir, pack.det_file)
        rec = os.path.join(model_dir, pack.rec_file)
        det_path = det if os.path.exists(det) else None
        rec_path = rec if os.path.exists(rec) else None
    return pack, det_path, rec_path


def load_pack(
    name: str,
    model_dir: Optional[str] = None,
    quant: Optional[str] = None,
):
    """Construct (FaceDetector, FaceRecognizer) for a named pack.

    quant: None | 'w8a8' | 'w8a8-fast' — optionally int8-quantize the
    recognizer after load (models/quant.py; 'fast' = selective wide-conv
    int8, the measured-fastest TPU config)."""
    from facerecognizeonnx_tpu.config import auto_config
    from facerecognizeonnx_tpu.errors import ModelLoadError
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector, FaceRecognizer

    pack, det_path, rec_path = resolve_pack(name, model_dir)
    cfg = auto_config(
        detector_weights=det_path,
        recognizer_weights=rec_path,
        rec_arch=pack.rec_arch,
        scrfd_variant=pack.det_variant,
    )
    detector = FaceDetector(cfg)
    if not detector.load_model(det_path):
        raise ModelLoadError(f"pack {name}: failed to load {det_path}")
    recognizer = FaceRecognizer(cfg)
    if not recognizer.load_model(rec_path):
        raise ModelLoadError(f"pack {name}: failed to load {rec_path}")
    if quant and quant != "none":
        recognizer.quantize(min_channels=128 if quant == "w8a8-fast" else 0)
    return detector, recognizer
