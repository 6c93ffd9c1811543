"""Native C++ runtime tests: letterbox vs cv2, NMS vs reference-semantics
oracle, frame ring threading."""

import threading

import cv2
import numpy as np
import pytest

from facerecognizeonnx_tpu.runtime.native import (
    FrameRing,
    PrefetchLoader,
    letterbox_native,
    native_available,
    nms_native,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native runtime not built (no g++?)"
)


def test_letterbox_matches_cv2(rng):
    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    got, scale = letterbox_native(img, 640)
    assert scale == pytest.approx(min(640 / 640, 640 / 480))
    nh, nw = int(480 * scale), int(640 * scale)
    ref = cv2.resize(img, (nw, nh))
    diff = np.abs(got[:nh, :nw].astype(int) - ref.astype(int))
    assert np.median(diff) <= 1 and diff.max() <= 3
    assert (got[nh:] == 0).all()


def test_letterbox_portrait(rng):
    img = rng.integers(0, 256, (640, 320, 3), dtype=np.uint8)
    got, scale = letterbox_native(img, 640)
    assert scale == pytest.approx(1.0)
    assert (got[:, 320:] == 0).all()


def test_nms_float_matches_python_oracle(rng):
    from tests.test_ops_nms import greedy_nms_oracle

    xy = rng.uniform(0, 400, (48, 2))
    wh = rng.uniform(10, 100, (48, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, 48).astype(np.float32)
    keep = nms_native(boxes, scores, 0.4, int_rects=False)
    order, keep_sorted = greedy_nms_oracle(boxes, scores, 0.4)
    ref_keep = np.zeros(48, bool)
    ref_keep[order[keep_sorted]] = True
    np.testing.assert_array_equal(keep, ref_keep)


def test_nms_int_rect_reference_semantics():
    # two boxes whose float IoU > thr but int-truncated IoU <= thr:
    # trunc drops fractional overlap → reference keeps both
    boxes = np.array(
        [[0.0, 0.0, 10.9, 10.9], [10.05, 0.0, 21.0, 10.9]], np.float32
    )
    scores = np.array([0.9, 0.8], np.float32)
    keep_f = nms_native(boxes, scores, 0.03, int_rects=False)
    keep_i = nms_native(boxes, scores, 0.03, int_rects=True)
    assert keep_f.tolist() == [True, False]  # float overlap 0.85*10.9
    assert keep_i.tolist() == [True, True]  # int rects [0,10]x[10,21] touch only


def test_frame_ring_roundtrip(rng):
    ring = FrameRing(4, (32, 32, 3))
    frames = [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(3)]
    for i, f in enumerate(frames):
        assert ring.push(f, scale=float(i))
    assert len(ring) == 3
    for i, f in enumerate(frames):
        out, scale = ring.pop()
        np.testing.assert_array_equal(out, f)
        assert scale == float(i)


def test_frame_ring_blocks_when_full(rng):
    ring = FrameRing(1, (8, 8, 3))
    f = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert ring.push(f)
    assert not ring.push(f, timeout_ms=50)  # full → timeout


def test_frame_ring_close_drains():
    ring = FrameRing(2, (8, 8, 3))
    ring.push(np.zeros((8, 8, 3), np.uint8))
    ring.close()
    assert ring.pop() is not None  # drains existing
    assert ring.pop() is None  # then reports closed


def test_prefetch_loader_pipelines(rng):
    src = [rng.integers(0, 256, (120, 160, 3), dtype=np.uint8) for _ in range(5)]
    loader = PrefetchLoader(iter(src), target=64, capacity=2)
    got = list(loader.frames())
    loader.join(5)
    assert len(got) == 5
    for frame, scale in got:
        assert frame.shape == (64, 64, 3)
        assert scale == pytest.approx(64 / 160)


def test_concurrent_producer_consumer(rng):
    ring = FrameRing(4, (16, 16, 3))
    n = 50
    frames = rng.integers(0, 256, (n, 16, 16, 3), dtype=np.uint8)

    def produce():
        for i in range(n):
            while not ring.push(frames[i], scale=float(i), timeout_ms=100):
                pass
        ring.close()

    t = threading.Thread(target=produce)
    t.start()
    seen = []
    while True:
        item = ring.pop(timeout_ms=2000)
        if item is None:
            break
        seen.append(item)
    t.join()
    assert len(seen) == n
    for i, (f, s) in enumerate(seen):  # FIFO order preserved
        assert s == float(i)
        np.testing.assert_array_equal(f, frames[i])


# ------------------------------------------------------------- image codecs


codecs = pytest.mark.skipif(
    not __import__(
        "facerecognizeonnx_tpu.runtime.native", fromlist=["codecs_available"]
    ).codecs_available(),
    reason="native runtime built without libjpeg/libpng",
)


def _png_bytes(img_rgb):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_rgb).save(buf, "PNG")
    return buf.getvalue()


def _jpg_bytes(img_rgb, quality=95):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_rgb).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@codecs
def test_decode_png_bit_exact(rng):
    from facerecognizeonnx_tpu.runtime.native import decode_native

    img = rng.integers(0, 256, (61, 83, 3), dtype=np.uint8)  # RGB
    dec = decode_native(_png_bytes(img))
    assert dec is not None and dec.shape == (61, 83, 3)
    np.testing.assert_array_equal(dec, img[..., ::-1])  # BGR out


@codecs
def test_decode_jpeg_matches_cv2(rng):
    from facerecognizeonnx_tpu.runtime.native import decode_native

    img = rng.integers(0, 256, (61, 83, 3), dtype=np.uint8)
    data = _jpg_bytes(img)
    dec = decode_native(data)
    ref = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    assert dec is not None
    # same libjpeg-turbo underneath: identical decode
    diff = np.abs(dec.astype(int) - ref.astype(int))
    assert diff.max() <= 1


@codecs
def test_decode_grayscale_and_alpha_png(rng):
    from facerecognizeonnx_tpu.runtime.native import decode_native

    from PIL import Image
    import io

    gray = rng.integers(0, 256, (40, 50), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, mode="L").save(buf, "PNG")
    dec = decode_native(buf.getvalue())
    assert dec is not None and dec.shape == (40, 50, 3)
    np.testing.assert_array_equal(dec[..., 0], gray)  # replicated channels

    rgba = rng.integers(0, 256, (40, 50, 4), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(rgba, mode="RGBA").save(buf, "PNG")
    dec = decode_native(buf.getvalue())
    assert dec is not None and dec.shape == (40, 50, 3)


@codecs
def test_decode_rejects_garbage():
    from facerecognizeonnx_tpu.runtime.native import decode_native

    assert decode_native(b"") is None
    assert decode_native(b"definitely not an image") is None
    # truncated JPEG: valid magic, corrupt body
    assert decode_native(b"\xff\xd8\xff\xe0" + b"\x00" * 16) is None


@codecs
def test_decode_letterbox_composes(rng):
    from facerecognizeonnx_tpu.runtime.native import (
        decode_letterbox_native,
        decode_native,
    )

    img = rng.integers(0, 256, (97, 123, 3), dtype=np.uint8)
    data = _png_bytes(img)
    got = decode_letterbox_native(data, 64)
    assert got is not None
    frame, scale = got
    ref, ref_scale = letterbox_native(decode_native(data), 64)
    assert scale == pytest.approx(ref_scale)
    np.testing.assert_array_equal(frame, ref)


@codecs
def test_native_image_loader(rng, tmp_path):
    from PIL import Image

    from facerecognizeonnx_tpu.runtime.native import (
        NativeImageLoader,
        decode_native,
        letterbox_native,
    )

    paths, imgs = [], []
    for i in range(7):
        img = rng.integers(0, 256, (50 + i, 70, 3), dtype=np.uint8)
        ext = "png" if i % 2 else "jpg"
        p = tmp_path / f"im{i}.{ext}"
        Image.fromarray(img).save(p)
        paths.append(str(p))
        imgs.append(img)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"junk")
    paths.append(str(bad))
    missing = str(tmp_path / "missing.png")
    paths.append(missing)

    got = {}
    with NativeImageLoader(paths, 64, threads=2, capacity=3) as loader:
        for idx, frame, scale in loader:
            got[idx] = (frame, scale)
    assert sorted(got) == list(range(len(paths)))  # every input accounted
    assert got[7][0] is None and got[8][0] is None  # corrupt + missing flagged
    for i in range(7):
        frame, scale = got[i]
        with open(paths[i], "rb") as f:
            ref, ref_scale = letterbox_native(decode_native(f.read()), 64)
        assert scale == pytest.approx(ref_scale)
        np.testing.assert_array_equal(frame, ref)


@codecs
def test_imread_native_path_matches_cv2(rng, tmp_path):
    from facerecognizeonnx_tpu.io.imageio import imread

    img = rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img)
    np.testing.assert_array_equal(imread(p), img)
    assert imread(str(tmp_path / "nope.jpg")) is None


@codecs
def test_native_image_loader_early_close(rng, tmp_path):
    """Abandoning the iterator mid-list must not hang: close() stops the
    C++ workers (even when blocked pushing into a full queue) and joins
    them."""
    from PIL import Image

    from facerecognizeonnx_tpu.runtime.native import NativeImageLoader

    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    paths = []
    for i in range(24):
        p = tmp_path / f"i{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    loader = NativeImageLoader(paths, 32, threads=2, capacity=2)
    it = iter(loader)
    next(it)
    next(it)  # workers now blocked on the size-2 queue
    loader.close()  # must join cleanly, not deadlock
    assert loader._h is None
