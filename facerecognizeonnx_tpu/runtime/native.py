"""ctypes bindings for the native host runtime (runtime/cc/frt_runtime.cc).

Auto-builds libfrt_runtime.so with g++ on first use (cached next to the
source). Everything degrades gracefully: native_available() is False and
the Python/device paths are used when no compiler exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

from facerecognizeonnx_tpu.errors import NativeRuntimeUnavailable

_CC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cc")
_SO_PATH = os.path.join(_CC_DIR, "libfrt_runtime.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _CC_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (OSError, subprocess.SubprocessError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None

        lib.frt_letterbox.restype = ctypes.c_float
        lib.frt_letterbox.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.frt_nms.restype = ctypes.c_int
        lib.frt_nms.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.frt_ring_create.restype = ctypes.c_void_p
        lib.frt_ring_create.argtypes = [ctypes.c_int, ctypes.c_size_t]
        lib.frt_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.frt_ring_close.argtypes = [ctypes.c_void_p]
        lib.frt_ring_push.restype = ctypes.c_int
        lib.frt_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float, ctypes.c_int,
        ]
        lib.frt_ring_pop.restype = ctypes.c_int
        lib.frt_ring_pop.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.frt_ring_size.restype = ctypes.c_int
        lib.frt_ring_size.argtypes = [ctypes.c_void_p]
        try:  # codec/loader symbols (absent in a stale pre-codec .so)
            lib.frt_codecs_available.restype = ctypes.c_int
            lib.frt_image_info.restype = ctypes.c_int
            lib.frt_image_info.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.frt_decode.restype = ctypes.c_int
            lib.frt_decode.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.frt_decode_letterbox.restype = ctypes.c_float
            lib.frt_decode_letterbox.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int,
            ]
            lib.frt_loader_create.restype = ctypes.c_void_p
            lib.frt_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.frt_loader_next.restype = ctypes.c_int
            lib.frt_loader_next.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.c_int,
            ]
            lib.frt_loader_destroy.argtypes = [ctypes.c_void_p]
            lib._frt_has_codecs = bool(lib.frt_codecs_available())
        except AttributeError:
            lib._frt_has_codecs = False
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def letterbox_native(image_bgr: np.ndarray, target: int):
    """uint8 letterbox on host (reference geometry, src/face_detector.cpp:92-137).
    Returns (padded (target,target,3) uint8, scale)."""
    lib = _load()
    if lib is None:
        raise NativeRuntimeUnavailable("libfrt_runtime.so not built/loaded")
    img = np.ascontiguousarray(image_bgr, np.uint8)
    h, w = img.shape[:2]
    out = np.empty((target, target, 3), np.uint8)
    scale = lib.frt_letterbox(
        img.ctypes.data, h, w, out.ctypes.data, target
    )
    return out, float(scale)


def nms_native(
    boxes: np.ndarray, scores: np.ndarray, iou_threshold: float,
    int_rects: bool = True,
) -> np.ndarray:
    """Greedy NMS keep mask (original order). int_rects=True reproduces the
    reference's integer-rect IoU exactly (src/face_detector.cpp:340-354)."""
    lib = _load()
    if lib is None:
        raise NativeRuntimeUnavailable("libfrt_runtime.so not built/loaded")
    b = np.ascontiguousarray(boxes, np.float32)
    s = np.ascontiguousarray(scores, np.float32)
    n = len(s)
    keep = np.zeros(n, np.int32)
    lib.frt_nms(
        b.ctypes.data, s.ctypes.data, n,
        ctypes.c_float(iou_threshold), int(int_rects), keep.ctypes.data,
    )
    return keep.astype(bool)


def codecs_available() -> bool:
    """True when libfrt_runtime.so was built with libjpeg/libpng."""
    lib = _load()
    return bool(lib is not None and lib._frt_has_codecs)


def decode_native(data: bytes):
    """Decode JPEG/PNG bytes to a BGR uint8 array (cv2.imdecode channel
    order) in native code — the GIL is released during decode, so HTTP
    serve threads decode concurrently. Returns None on failure or when
    the native codecs are unavailable."""
    lib = _load()
    if lib is None or not lib._frt_has_codecs:
        return None
    h = ctypes.c_int(0)
    w = ctypes.c_int(0)
    if lib.frt_image_info(data, len(data), ctypes.byref(h), ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.frt_decode(data, len(data), out.ctypes.data, h.value, w.value):
        return None
    return out


def decode_letterbox_native(data: bytes, target: int):
    """Decode + letterbox in ONE native call: encoded bytes →
    ((target,target,3) BGR uint8, scale). None on failure."""
    lib = _load()
    if lib is None or not lib._frt_has_codecs:
        return None
    out = np.empty((target, target, 3), np.uint8)
    scale = lib.frt_decode_letterbox(data, len(data), out.ctypes.data, target)
    if scale <= 0:
        return None
    return out, float(scale)


class NativeImageLoader:
    """Multi-threaded native file loader: C++ workers read + decode +
    letterbox a path list into a bounded queue; iterate to consume
    detector-ready frames in completion order.

    Yields (index, frame, scale) per item; failed items yield
    (index, None, 0.0) so every input is accounted for. The native
    data-loader analog of the reference's serial cv::imread loop
    (src/main.cpp:71-72)."""

    def __init__(self, paths, target: int, threads: int = 1,
                 capacity: int = 8):
        lib = _load()
        if lib is None or not lib._frt_has_codecs:
            raise NativeRuntimeUnavailable(
                "libfrt_runtime.so missing or built without codecs"
            )
        self._lib = lib
        self.target = int(target)
        self.n = len(paths)
        arr = (ctypes.c_char_p * self.n)(
            *[os.fsencode(p) for p in paths]
        )
        self._h = lib.frt_loader_create(
            arr, self.n, self.target, int(threads), int(capacity)
        )
        if not self._h:
            raise NativeRuntimeUnavailable("frt_loader_create failed")

    def __iter__(self):
        while True:
            out = np.empty((self.target, self.target, 3), np.uint8)
            scale = ctypes.c_float(0.0)
            index = ctypes.c_int(-1)
            rc = self._lib.frt_loader_next(
                self._h, out.ctypes.data, ctypes.byref(scale),
                ctypes.byref(index), 30_000,
            )
            if rc == -2:
                return
            if rc == -1:
                raise TimeoutError("native loader stalled (30s)")
            if rc == -3:
                yield index.value, None, 0.0
            else:
                yield index.value, out, float(scale.value)

    def close(self) -> None:
        if self._h:
            self._lib.frt_loader_destroy(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FrameRing:
    """Bounded ring of fixed-size frames backed by the native buffer."""

    def __init__(self, capacity: int, frame_shape):
        lib = _load()
        if lib is None:
            raise NativeRuntimeUnavailable("libfrt_runtime.so not built/loaded")
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self._bytes = int(np.prod(frame_shape))
        self._h = lib.frt_ring_create(capacity, self._bytes)

    def push(self, frame: np.ndarray, scale: float = 1.0, timeout_ms: int = 1000) -> bool:
        f = np.ascontiguousarray(frame, np.uint8)
        assert f.shape == self.frame_shape, (f.shape, self.frame_shape)
        rc = self._lib.frt_ring_push(
            self._h, f.ctypes.data, ctypes.c_float(scale), timeout_ms
        )
        return rc == 0

    def pop(self, timeout_ms: int = 1000):
        out = np.empty(self.frame_shape, np.uint8)
        scale = ctypes.c_float(0.0)
        rc = self._lib.frt_ring_pop(
            self._h, out.ctypes.data, ctypes.byref(scale), timeout_ms
        )
        if rc == -2:
            return None  # closed and drained
        if rc == -1:
            raise TimeoutError("frame ring pop timed out")
        return out, float(scale.value)

    def close(self) -> None:
        self._lib.frt_ring_close(self._h)

    def __len__(self) -> int:
        return self._lib.frt_ring_size(self._h)

    def __del__(self):
        try:
            self._lib.frt_ring_destroy(self._h)
        except Exception:
            pass


class PrefetchLoader:
    """Producer thread: read frames from a source, letterbox natively,
    push into the ring; the consumer (TPU feed loop) pops. Overlaps host
    decode/resize with device compute — the pipelining the reference's
    serial frame loop (src/main.cpp:214-257) lacks."""

    def __init__(self, frame_iter, target: int, capacity: int = 8):
        self.ring = FrameRing(capacity, (target, target, 3))
        self.target = target
        self._thread = threading.Thread(
            target=self._produce, args=(frame_iter,), daemon=True
        )
        self._thread.start()

    def _produce(self, frame_iter):
        try:
            for frame in frame_iter:
                padded, scale = letterbox_native(frame, self.target)
                while True:
                    if self.ring.push(padded, scale, timeout_ms=200):
                        break
        finally:
            self.ring.close()

    def frames(self) -> Iterator:
        while True:
            item = self.ring.pop(timeout_ms=10_000)
            if item is None:
                return
            yield item

    def join(self, timeout=None):
        self._thread.join(timeout)
