"""JAX model definitions (NHWC, functional, jit/vmap/pjit-friendly).

TPU-native re-expressions of the buffalo-family networks the reference
drives through ONNX Runtime (SURVEY.md §2 C21):
  - `arcface`:       w600k_r50 — ArcFace IResNet (18/34/50/100), 112x112 → 512-d
  - `mobilefacenet`: w600k_mbf — MobileFaceNet (buffalo_s/sc packs), same I/O
  - `vit`:           ViT face embedder (vit_t/s/b), same I/O — MXU-first
  - `scrfd`:         det_500m  — SCRFD anchor-free detector (500m/2.5g/10g)
"""

__all__ = ["arcface", "layers", "mobilefacenet", "scrfd", "vit"]


def __getattr__(name):
    if name in __all__:
        import importlib

        return importlib.import_module(f"facerecognizeonnx_tpu.models.{name}")
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def recognizer_module(arch: str):
    """The model module implementing a recognizer arch name
    ("iresnet18/34/50/100" → arcface, "mbf"/"mbf_large" → mobilefacenet)."""
    import importlib

    if arch.startswith("iresnet"):
        return importlib.import_module("facerecognizeonnx_tpu.models.arcface")
    if arch.startswith("mbf"):
        return importlib.import_module(
            "facerecognizeonnx_tpu.models.mobilefacenet"
        )
    if arch.startswith("vit"):
        return importlib.import_module("facerecognizeonnx_tpu.models.vit")
    raise ValueError(f"unknown recognizer arch {arch!r}")


def recognizer_module_for(params) -> object:
    """Same, inferred from a params pytree's structure ("body" is unique
    to MobileFaceNet, "pos_embed" to ViT, "layer1" to IResNet) so jitted
    code paths need no arch string threaded through."""
    import importlib

    if "pos_embed" in params:
        name = "vit"
    else:
        name = "mobilefacenet" if "body" in params else "arcface"
    return importlib.import_module(f"facerecognizeonnx_tpu.models.{name}")


def recognizer_apply(params, x, compute_dtype, train: bool = False):
    """Dispatch a recognizer forward pass on param structure."""
    return recognizer_module_for(params).apply(
        params, x, compute_dtype=compute_dtype, train=train
    )
