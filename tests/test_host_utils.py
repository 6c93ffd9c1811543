"""Host-side utility modules: io/imageio, utils/draw, utils/observability.

These back the CLI/video surfaces (reference src/main.cpp:6-37 overlay,
:42/:205 imread/VideoCapture) and the bench counters; pinned directly
here since the CLI tests only exercise them incidentally.
"""

import time

import numpy as np
import pytest

from facerecognizeonnx_tpu.io.imageio import VideoSource, imread, imwrite
from facerecognizeonnx_tpu.types import FaceBox
from facerecognizeonnx_tpu.utils.draw import draw_face_info
from facerecognizeonnx_tpu.utils.observability import Counter, StageTimer


def test_imwrite_imread_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    path = str(tmp_path / "rt.png")  # png: lossless, exact roundtrip
    assert imwrite(path, img)
    back = imread(path)
    np.testing.assert_array_equal(back, img)
    assert imread(str(tmp_path / "missing.png")) is None


def test_video_source_synthetic():
    src = VideoSource("synthetic:64x48x5")
    assert src.is_open()
    frames = list(src.frames())
    assert len(frames) == 5
    assert frames[0].shape == (48, 64, 3) and frames[0].dtype == np.uint8
    # frames differ (rolled) but are deterministic across sources
    assert not np.array_equal(frames[0], frames[1])
    again = list(VideoSource("synthetic:64x48x5").frames())
    np.testing.assert_array_equal(frames[3], again[3])
    src.release()  # no-op for synthetic


def test_draw_face_info_overlay(rng):
    img = np.zeros((120, 120, 3), np.uint8)
    face = FaceBox(
        box=(20, 40, 50, 50),
        score=0.9,
        landmarks=[(30, 50), (60, 50), (45, 65), (35, 80), (55, 80)],
    )
    draw_face_info(img, face, label="Match", similarity=0.87)
    # green rect border pixel (BGR), red landmark dot, something was drawn
    assert img.sum() > 0
    assert tuple(img[40, 45]) == (0, 255, 0)  # top edge of the box
    assert img[50, 30, 2] == 255 and img[50, 30, 0] == 0  # red dot


def test_stage_timer_and_counter():
    t = StageTimer(enabled=True)
    with t.stage("warm"):
        time.sleep(0.01)
    with t.stage("warm"):
        pass
    assert t.counts["warm"] == 2
    assert t.totals["warm"] >= 0.01
    assert "warm" in t.report()

    off = StageTimer(enabled=False)
    with off.stage("x"):
        pass
    assert not off.totals  # disabled: records nothing

    c = Counter("faces")
    for _ in range(5):
        with c.event(items=8):
            time.sleep(0.002)
    s = c.summary()
    assert s["count"] == 5
    assert s["faces_per_sec"] > 0
    assert s["p99_ms"] >= s["p50_ms"] >= 2.0
