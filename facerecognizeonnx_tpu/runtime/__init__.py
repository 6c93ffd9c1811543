from facerecognizeonnx_tpu.runtime.native import (
    FrameRing,
    PrefetchLoader,
    letterbox_native,
    native_available,
    nms_native,
)

__all__ = [
    "FrameRing",
    "PrefetchLoader",
    "letterbox_native",
    "native_available",
    "nms_native",
]
