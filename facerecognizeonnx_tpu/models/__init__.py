"""JAX model definitions (NHWC, functional, jit/vmap/pjit-friendly).

TPU-native re-expressions of the two buffalo_sc networks the reference
drives through ONNX Runtime (SURVEY.md §2 C21):
  - `arcface`: w600k_r50 — ArcFace IResNet-50, 112x112 → 512-d feature
  - `scrfd`:   det_500m  — SCRFD anchor-free detector, 640x640 → 9 heads
"""

__all__ = ["arcface", "layers", "scrfd"]


def __getattr__(name):
    if name in __all__:
        import importlib

        return importlib.import_module(f"facerecognizeonnx_tpu.models.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
