"""Checkpoint round-trip + gallery persistence (SURVEY.md §5 checkpoint/resume)."""

import jax
import numpy as np
import pytest

from facerecognizeonnx_tpu.match.gallery import GalleryBank
from facerecognizeonnx_tpu.models import arcface
from facerecognizeonnx_tpu.utils import checkpoint


def test_params_roundtrip(tmp_path):
    params = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")
    path = str(tmp_path / "arc.npz")
    checkpoint.save_params(path, params)
    loaded = checkpoint.load_params(path)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    # lists must come back as lists (block stages)
    assert isinstance(loaded["layer1"], list)


def test_loaded_params_run(tmp_path):
    import jax.numpy as jnp

    params = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")
    path = str(tmp_path / "arc.npz")
    checkpoint.save_params(path, params)
    loaded = checkpoint.load_params(path)
    x = jnp.zeros((1, 112, 112, 3))
    np.testing.assert_allclose(
        np.asarray(arcface.apply(params, x)),
        np.asarray(arcface.apply(loaded, x)),
        atol=1e-6,
    )


def test_gallery_roundtrip(tmp_path, rng):
    bank = GalleryBank()
    feats = rng.normal(size=(5, 512)).astype(np.float32)
    for i in range(5):
        bank.add(f"person{i}", feats[i])
    path = str(tmp_path / "gallery.npz")
    bank.save(path)
    loaded = GalleryBank.load(path)
    assert loaded.names == bank.names
    np.testing.assert_allclose(loaded.features, bank.features)
    # features stored L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(loaded.features, axis=1), np.ones(5), atol=1e-5
    )


def test_gallery_search_identity(rng):
    bank = GalleryBank()
    feats = rng.normal(size=(20, 512)).astype(np.float32)
    bank.add_batch([f"p{i}" for i in range(20)], feats)
    names, sims = bank.search(feats[3] / np.linalg.norm(feats[3]), top_k=2)
    assert names[0][0] == "p3"
    assert sims[0][0] == pytest.approx(1.0, abs=1e-5)


def test_gallery_dim_mismatch():
    bank = GalleryBank()
    with pytest.raises(ValueError):
        bank.add("x", np.zeros(64, np.float32))


def test_gallery_empty_search():
    bank = GalleryBank()
    names, sims = bank.search(np.ones((2, 512), np.float32), top_k=3)
    assert names == [[], []]
    assert sims.shape == (2, 0)


def test_api_load_from_npz(tmp_path):
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.pipeline.api import FaceRecognizer

    cfg = PipelineConfig(compute_dtype="float32")
    params = arcface.init_params(jax.random.PRNGKey(5))
    path = str(tmp_path / "rec.npz")
    checkpoint.save_params(path, params)
    rec = FaceRecognizer(cfg)
    assert rec.load_model(path)
    img = np.random.default_rng(0).integers(0, 256, (128, 128, 3), dtype=np.uint8)
    assert rec.extract_feature_simple(img).shape == (512,)


def test_api_load_missing_file():
    from facerecognizeonnx_tpu.pipeline.api import FaceRecognizer

    rec = FaceRecognizer()
    assert rec.load_model("/nonexistent/model.npz") is False


def test_gallery_device_cache_invalidated_on_add(rng):
    """The device-resident bank cache (GalleryBank._device_feats) must be
    dropped on mutation — a stale cache would silently search the OLD
    bank after an enroll."""
    import numpy as np

    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    def unit(seed):
        v = rng.normal(size=512).astype(np.float32)
        return v / np.linalg.norm(v)

    bank = GalleryBank()
    a = unit(0)
    bank.add("a", a)
    names, sims = bank.search(a[None], top_k=1)
    assert names[0][0] == "a"
    assert bank._dev_cache  # populated by the search

    b = unit(1)
    bank.add("b", b)
    assert not bank._dev_cache  # invalidated by the add
    names, sims = bank.search(b[None], top_k=1)
    assert names[0][0] == "b"  # the NEW row must win
    assert sims[0][0] > 0.99

    # add_batch invalidates too, and the bf16 capacity option coexists
    c = unit(2)
    bank.add_batch(["c"], c[None])
    names, _ = bank.search(c[None], top_k=1, storage_dtype="bfloat16")
    assert names[0][0] == "c"
    names, _ = bank.search(c[None], top_k=1)
    assert names[0][0] == "c"
    assert len(bank._dev_cache) == 2  # f32 and bf16 copies cached


def test_gallery_remove_and_rename(rng):
    bank = GalleryBank()
    feats = rng.normal(size=(5, 512)).astype(np.float32)
    bank.add_batch(["a", "b", "a", "c", "b"], feats)
    q = (feats[:1] / np.linalg.norm(feats[0])).astype(np.float32)
    names, _ = bank.search(q)
    assert names[0][0] == "a"

    assert bank.remove("a") == 2
    assert len(bank) == 3 and bank.names == ["b", "c", "b"]
    # device cache invalidated: the removed identity can't match anymore
    names, _ = bank.search(q)
    assert names[0][0] != "a"
    assert bank.remove("missing") == 0

    assert bank.rename("b", "bob") == 2
    assert bank.names == ["bob", "c", "bob"]
    names, sims = bank.search(q, top_k=3)
    assert set(names[0]) == {"bob", "c"}


def test_gallery_search_vs_remove_race(rng):
    """search() must stay crash-free and label-consistent while another
    thread enrolls/removes (the HTTP server's identify vs DELETE
    /enroll): every search works on one atomic _Store snapshot."""
    import threading

    bank = GalleryBank(feature_dim=8)
    feats = rng.normal(size=(64, 8)).astype(np.float32)
    bank.add_batch([f"p{i}" for i in range(64)], feats)
    q = (feats[:4] / np.linalg.norm(feats[:4], axis=1, keepdims=True)).astype(
        np.float32
    )
    errors = []
    stop = threading.Event()

    def churn():
        i = 0
        while not stop.is_set():
            bank.remove(f"p{i % 64}")
            bank.add(f"p{i % 64}", feats[i % 64])
            i += 1

    def searcher():
        try:
            for _ in range(150):
                names, sims = bank.search(q, top_k=3)
                assert sims.shape == (4, 3)
                for row in names:
                    assert len(row) == 3
                    assert all(n.startswith("p") for n in row)
        except Exception as e:  # surfaced after join
            errors.append(e)

    t_churn = threading.Thread(target=churn)
    searchers = [threading.Thread(target=searcher) for _ in range(2)]
    t_churn.start()
    for t in searchers:
        t.start()
    for t in searchers:
        t.join(timeout=300)
    stop.set()
    t_churn.join(timeout=60)
    assert not errors, errors
    assert len(bank) == 64


def test_gallery_find_duplicates(rng):
    """find_duplicates surfaces near-identical rows across names and
    honors the strict-upper-triangle one-report-per-pair contract."""
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    bank = GalleryBank(feature_dim=64)
    feats = rng.normal(size=(20, 64)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    # plant one cross-name duplicate: row 17 is a tiny perturbation of 3
    feats[17] = feats[3] + 0.01 * rng.normal(size=64).astype(np.float32)
    feats[17] /= np.linalg.norm(feats[17])
    names = [f"p{i}" for i in range(20)]
    bank.add_batch(names, feats)

    dup = bank.find_duplicates(threshold=0.9, chunk=7)  # chunk < n: seams
    pairs = {(a, b) for a, b, _ in dup}
    assert ("p3", "p17") in pairs
    # no self-pairs, no reversed double-reports
    assert all(a != b for a, b, _ in dup)
    assert ("p17", "p3") not in pairs
    # random 64-d unit rows are far apart: nothing else above 0.9
    assert pairs == {("p3", "p17")}
    sim = dict(((a, b), s) for a, b, s in dup)[("p3", "p17")]
    assert sim > 0.99

    # empty / single-row banks return no pairs
    assert GalleryBank(feature_dim=64).find_duplicates() == []
