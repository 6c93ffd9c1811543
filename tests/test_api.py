"""Reference-compatible API surface tests (SURVEY.md §2 C2-C13 contracts)."""

import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.pipeline.api import FaceDetector, FaceRecognizer
from facerecognizeonnx_tpu.types import Detections, FaceBox, face_boxes_to_arrays

CFG = PipelineConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def detector():
    d = FaceDetector(CFG)
    assert d.load_model()
    return d


@pytest.fixture(scope="module")
def recognizer():
    r = FaceRecognizer(CFG)
    assert r.loadModel()  # camelCase alias (reference face_recognizer.h:14)
    return r


@pytest.fixture(scope="module")
def image(request):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)


def _face():
    return FaceBox(
        box=(300, 200, 120, 140),
        score=0.9,
        landmarks=np.array(
            [[330, 250], [390, 250], [360, 290], [335, 320], [385, 320]],
            np.float32,
        ),
    )


def test_detect_returns_face_boxes(detector, image):
    faces = detector.detect(image)
    assert isinstance(faces, list)
    for f in faces[:3]:
        assert isinstance(f, FaceBox)
        assert all(isinstance(v, int) for v in f.box)  # reference int rects
        assert f.landmarks.shape == (5, 2)


def test_detect_empty_image_guard(detector):
    assert detector.detect(np.zeros((0, 0, 3), np.uint8)) == []
    assert detector.detect(None) == []


def test_detect_unloaded_model_guard(image):
    assert FaceDetector(CFG).detect(image) == []


def test_extract_feature_is_normalized(recognizer, image):
    feat = recognizer.extract_feature(image, _face())
    assert feat.shape == (512,)
    assert np.linalg.norm(feat) == pytest.approx(1.0, abs=1e-5)


def test_extract_feature_camelcase_alias(recognizer, image):
    f1 = recognizer.extractFeature(image, _face())
    f2 = recognizer.extract_feature(image, _face())
    np.testing.assert_array_equal(f1, f2)


def test_extract_features_batch_matches_single(recognizer, image):
    faces = [_face(), _face()]
    feats = recognizer.extract_features(image, faces)
    single = recognizer.extract_feature(image, faces[0])
    assert feats.shape == (2, 512)
    np.testing.assert_allclose(feats[0], single, atol=1e-5)
    np.testing.assert_allclose(feats[0], feats[1], atol=1e-5)


def test_compare_faces_semantics(recognizer):
    f = np.zeros(512, np.float32)
    f[0] = 1.0
    g = np.zeros(512, np.float32)
    g[0] = -1.0
    # (dot+1)/2 mapping (reference src/face_recognizer.cpp:333)
    assert recognizer.compare_faces(f, f) == pytest.approx(1.0)
    assert recognizer.compare_faces(f, g) == pytest.approx(0.0)
    # guards (reference :321-323)
    assert recognizer.compare_faces(f, np.zeros(3)) == 0.0
    assert recognizer.compare_faces(np.zeros(0), np.zeros(0)) == 0.0


def test_extract_feature_simple(recognizer, image):
    feat = recognizer.extract_feature_simple(image)
    assert feat.shape == (512,)
    assert np.linalg.norm(feat) == pytest.approx(1.0, abs=1e-5)
    # deterministic
    np.testing.assert_array_equal(feat, recognizer.extractFeatureSimple(image))


def test_face_box_roundtrip():
    faces = [_face()]
    dets = face_boxes_to_arrays(faces, 4)
    assert isinstance(dets, Detections)
    back = dets.to_face_boxes()
    assert len(back) == 1
    assert back[0].box == pytest.approx(faces[0].box)
    np.testing.assert_allclose(back[0].landmarks, faces[0].landmarks)


def test_detect_batch_matches_single(detector, image):
    """detect_batch on [img, img2] must reproduce per-image detect()
    exactly (same program weights, batched letterbox) — and handle a
    bad frame slot with the empty-list guard."""
    rng = np.random.default_rng(7)
    image2 = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    batched = detector.detect_batch([image, None, image2])
    singles = [detector.detect(image), [], detector.detect(image2)]
    assert len(batched) == 3
    assert batched[1] == []
    for got, want in zip([batched[0], batched[2]], [singles[0], singles[2]]):
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert g.box == w.box
            assert g.score == pytest.approx(w.score, abs=1e-5)
            np.testing.assert_allclose(g.landmarks, w.landmarks, atol=1e-2)


def test_detect_batch_mixed_shapes(detector, image):
    """Mixed resolutions bucket by shape (one dispatch per bucket)."""
    rng = np.random.default_rng(8)
    small = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    batched = detector.detect_batch([image, small])
    want_big, want_small = detector.detect(image), detector.detect(small)
    assert len(batched[0]) == len(want_big)
    assert [f.box for f in batched[0]] == [f.box for f in want_big]
    assert len(batched[1]) == len(want_small)
    assert [f.box for f in batched[1]] == [f.box for f in want_small]


def test_detect_batch_unloaded_guard(image):
    assert FaceDetector(CFG).detect_batch([image]) == [[]]


def test_detect_files_matches_detect_batch(detector, tmp_path):
    """detect_files: native C++ decode+letterbox feeding fixed-shape
    padded batches must agree with detect_batch on the decoded images
    at the SAME batch size (PNG decode is bit-exact, so the only delta
    is the native-u8 vs device-float letterbox — same rounding band the
    host_letterbox path allows). Unreadable files get []."""
    from facerecognizeonnx_tpu.runtime import native

    if not native.codecs_available():
        pytest.skip("native codecs unavailable")
    import cv2

    # 640x640 inputs: letterbox is an exact no-op for both the native-u8
    # and device-float paths, so parity must be BIT-EXACT — this pins the
    # decode/loader/batch-padding/scale plumbing. (The u8-vs-float resize
    # rounding band is covered by test_letterbox_matches_cv2 and
    # test_host_letterbox_matches_device_path.)
    rng = np.random.default_rng(11)
    imgs = [
        rng.integers(0, 256, (640, 640, 3), dtype=np.uint8) for _ in range(2)
    ]
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    cv2.imwrite(p1, imgs[0])
    cv2.imwrite(p2, imgs[1])
    bad = str(tmp_path / "bad.jpg")
    open(bad, "wb").write(b"junk")

    # bad file is skipped, so both valid frames land in ONE batch of 2 —
    # the same batch shape detect_batch runs
    got = detector.detect_files([p1, bad, p2], batch_size=2)
    want = detector.detect_batch(imgs)
    assert len(got) == 3
    assert got[1] == []
    for faces, ref in [(got[0], want[0]), (got[2], want[1])]:
        assert len(faces) == len(ref)
        for g, w in zip(faces, ref):
            assert g.box == w.box
            assert g.score == pytest.approx(w.score, abs=1e-6)
            np.testing.assert_allclose(g.landmarks, w.landmarks, atol=1e-4)


def test_detect_files_padded_tail(detector, tmp_path):
    """A partial tail batch (zero-padded to batch_size) must not leak
    detections from pad rows or drop real ones."""
    from facerecognizeonnx_tpu.runtime import native

    if not native.codecs_available():
        pytest.skip("native codecs unavailable")
    import cv2

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (300, 420, 3), dtype=np.uint8)
    p = str(tmp_path / "one.png")
    cv2.imwrite(p, img)
    got = detector.detect_files([p], batch_size=4)
    assert len(got) == 1
    ref = detector.detect_batch([img])[0]
    assert len(got[0]) == len(ref)


def test_detect_files_unloaded_guard(tmp_path):
    p = str(tmp_path / "x.png")
    assert FaceDetector(CFG).detect_files([p]) == [[]]
