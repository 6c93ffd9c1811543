"""facerecognizeonnx_tpu — TPU-native face recognition framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cucibala/FaceRecognizeOnnx (reference mounted at /root/reference):
SCRFD face detection with 5-point landmarks, similarity-transform
alignment to 112x112, ArcFace IResNet-50 512-d embedding, and cosine
similarity matching — all as jit-compiled, batchable device programs,
with sharded 1:N gallery search over a `jax.sharding.Mesh`.

Public API mirrors the reference's component surface
(reference: src/face_detector.h:14-27, src/face_recognizer.h:10-22):

    FaceDetector.detect(image, score_threshold=0.5, nms_threshold=0.4)
    FaceRecognizer.extract_feature(image, face)
    FaceRecognizer.extract_feature_simple(image)
    FaceRecognizer.compare_faces(f1, f2)   # (cos+1)/2, threshold 0.6
"""

from facerecognizeonnx_tpu.version import __version__
from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.types import FaceBox, Detections

__all__ = [
    "__version__",
    "PipelineConfig",
    "FaceBox",
    "Detections",
    "FaceDetector",
    "FaceRecognizer",
    "FaceApp",
    "load_pack",
]


def __getattr__(name):
    # Lazy imports keep `import facerecognizeonnx_tpu` cheap (no model build).
    if name in ("FaceDetector", "FaceRecognizer"):
        from facerecognizeonnx_tpu.pipeline import api

        return getattr(api, name)
    if name == "FaceApp":
        from facerecognizeonnx_tpu.pipeline.app import FaceApp

        return FaceApp
    if name == "load_pack":
        from facerecognizeonnx_tpu.models.packs import load_pack

        return load_pack
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
