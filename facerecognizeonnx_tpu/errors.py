"""Typed error hierarchy (SURVEY.md §5 failure-detection plan).

The reference degrades silently — empty vectors + stderr prints
(src/face_detector.cpp:142-156, src/face_recognizer.cpp:254-257). The
public API keeps those guard semantics for drop-in compatibility, but
framework internals raise these typed errors so callers who want
failures loud can catch something meaningful.
"""


class FrtError(Exception):
    """Base class for facerecognizeonnx_tpu errors."""


class ModelLoadError(FrtError):
    """Weights missing/corrupt, or ONNX graph unsupported."""


class UnsupportedOnnxOp(FrtError, NotImplementedError):
    """Graph executor hit an op outside the registry."""


class InvalidInputError(FrtError, ValueError):
    """Image/feature input fails shape or dtype validation."""


class GalleryError(FrtError, ValueError):
    """Gallery bank misuse (dim mismatch, missing file)."""


class NativeRuntimeUnavailable(FrtError, RuntimeError):
    """libfrt_runtime.so could not be built/loaded."""
