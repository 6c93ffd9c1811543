"""Host image/video I/O (the only place OpenCV is allowed).

Mirrors the reference's I/O usage: cv::imread (src/main.cpp:42,71-72),
cv::VideoCapture (src/main.cpp:205) — decode/encode and camera capture
stay on host; every pixel operation after this boundary is on-device.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def imread(path: str) -> Optional[np.ndarray]:
    """Read an image as BGR uint8 (cv::imread semantics); None on failure.

    JPEG/PNG go through the native runtime decoder (bit-exact with
    cv2.imdecode — both link libjpeg-turbo/libpng — and GIL-free);
    other formats and codec-less builds fall back to cv2, then PIL."""
    if path.lower().endswith((".jpg", ".jpeg", ".png")):
        try:
            from facerecognizeonnx_tpu.runtime import native

            with open(path, "rb") as f:
                img = native.decode_native(f.read())
            if img is not None:
                return img
        except OSError:
            return None
    if _HAS_CV2:
        img = cv2.imread(path)
        return img
    from PIL import Image  # fallback: PIL gives RGB → flip to BGR

    try:
        return np.asarray(Image.open(path).convert("RGB"))[..., ::-1].copy()
    except Exception:
        return None


def imwrite(path: str, image_bgr: np.ndarray) -> bool:
    if _HAS_CV2:
        return bool(cv2.imwrite(path, image_bgr))
    from PIL import Image

    Image.fromarray(image_bgr[..., ::-1]).save(path)
    return True


class VideoSource:
    """Frame iterator over a camera index or video file.

    Wraps cv::VideoCapture (reference src/main.cpp:205-217); also accepts
    "synthetic:WxHxN" for headless benchmarking without a camera."""

    def __init__(self, source: int | str = 0):
        self._synthetic = None
        if isinstance(source, str) and source.startswith("synthetic:"):
            spec = source.split(":", 1)[1]
            w, h, n = (int(v) for v in spec.split("x"))
            self._synthetic = (w, h, n)
            self._cap = None
        else:
            if not _HAS_CV2:
                raise RuntimeError("OpenCV unavailable; only synthetic sources work")
            self._cap = cv2.VideoCapture(source)

    def is_open(self) -> bool:
        if self._synthetic is not None:
            return True
        return bool(self._cap and self._cap.isOpened())

    def frames(self) -> Iterator[np.ndarray]:
        if self._synthetic is not None:
            w, h, n = self._synthetic
            rng = np.random.default_rng(0)
            base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            for i in range(n):
                yield np.roll(base, i * 7, axis=1)
            return
        while True:
            ok, frame = self._cap.read()
            if not ok or frame is None:
                return
            yield frame

    def release(self) -> None:
        if self._cap is not None:
            self._cap.release()
