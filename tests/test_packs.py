"""Named buffalo packs (models/packs.py) + FaceApp front-end
(pipeline/app.py).

The reference hardcodes one pack (buffalo_sc: det_500m + w600k_r50,
src/main.cpp:269-270, models/README.md:28-30); the registry generalizes
to the published buffalo family with the same file-layout contract.
"""

import numpy as np
import pytest

from facerecognizeonnx_tpu.models.packs import PACKS, pack_names, resolve_pack


def test_registry_contents():
    assert pack_names() == ("buffalo_l", "buffalo_m", "buffalo_s", "buffalo_sc")
    # the reference's own pack definition (models/README.md:28-30)
    sc = PACKS["buffalo_sc"]
    assert sc.det_variant == "500m" and sc.rec_arch == "iresnet50"
    assert sc.det_file == "det_500m.onnx" and sc.rec_file == "w600k_r50.onnx"
    assert PACKS["buffalo_s"].rec_arch == "mbf"
    assert PACKS["buffalo_l"].det_variant == "10g"


def test_resolve_unknown_raises():
    with pytest.raises(KeyError, match="buffalo_l"):
        resolve_pack("nope")


def test_resolve_missing_files_give_none(tmp_path):
    pack, det, rec = resolve_pack("buffalo_sc", str(tmp_path))
    assert det is None and rec is None
    # a present file resolves to its path
    (tmp_path / "det_500m.onnx").write_bytes(b"x")
    pack, det, rec = resolve_pack("buffalo_sc", str(tmp_path))
    assert det is not None and det.endswith("det_500m.onnx")
    assert rec is None


def test_face_app_from_pack_verify():
    """FaceApp wires pack construction → detect → batched embed →
    compare with the reference's guards (0.0 / False when no face)."""
    from facerecognizeonnx_tpu.pipeline.app import Face, FaceApp

    app = FaceApp.from_pack("buffalo_s")  # mbf: the CPU-fast member
    assert app.recognizer.cfg.rec_arch == "mbf"
    assert app.detector.cfg.scrfd_variant == "500m"

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    faces = app.get(img)
    for f in faces:
        assert isinstance(f, Face)
        assert f.embedding.shape == (512,)
        np.testing.assert_allclose(np.linalg.norm(f.embedding), 1.0, atol=1e-3)
        assert f.landmarks.shape == (5, 2)

    same, sim = app.verify(img, img)
    if faces:  # random-weight detector found faces: self-sim is maximal
        assert sim > 0.99 and same
    else:  # reference guard: empty features compare to 0.0
        assert sim == 0.0 and not same

    # identical-image compare equals the pairwise compare of embeddings
    assert app.compare(img, img) == pytest.approx(sim)


def test_face_app_gallery_enroll_identify(tmp_path):
    """FaceApp 1:N surface: enroll → identify labels the same image's
    faces; empty-gallery identify is []; gallery is assignable."""
    from facerecognizeonnx_tpu.match.gallery import GalleryBank
    from facerecognizeonnx_tpu.pipeline.app import FaceApp

    app = FaceApp.from_pack("buffalo_s")
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)

    assert app.identify(img) == []  # empty gallery guard

    enrolled = app.enroll("alice", img)
    if not enrolled:  # random detector found nothing: nothing added
        assert len(app.gallery) == 0
        return
    assert len(app.gallery) == 1

    results = app.identify(img, top_k=1)
    assert results, "faces existed at enroll time, must exist now"
    # the enrolled face re-identifies as alice at self-similarity
    labels = {r["label"] for r in results}
    assert "alice" in labels
    best = [r for r in results if r["label"] == "alice"][0]
    assert best["matches"][0][0] == "alice"
    assert best["matches"][0][1] > 0.99

    # round-trip through a saved bank
    p = str(tmp_path / "app_g.npz")
    app.gallery.save(p)
    app2 = FaceApp.from_pack("buffalo_s")
    app2.gallery = GalleryBank.load(p)
    assert [r["label"] for r in app2.identify(img)] == [
        r["label"] for r in results
    ]
