"""Video pipeline + batched enrollment tests (BASELINE configs 3 & 4)."""

import jax
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.pipeline.enroll import enroll_batch
from facerecognizeonnx_tpu.pipeline.video import VideoPipeline
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

CFG = PipelineConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def models():
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(lambda: arcface.init_params(jax.random.PRNGKey(1)))
    return det, arc


def test_video_pipeline_processes_all_frames(models, rng):
    det, arc = models
    pipe = VideoPipeline(det, arc, CFG, batch=2, max_faces_embed=4)
    frames = [
        rng.integers(0, 256, (360, 480, 3), dtype=np.uint8) for _ in range(5)
    ]
    results = list(pipe.run(iter(frames)))
    assert len(results) == 5
    idxs = [r[0] for r in results]
    assert idxs == [0, 1, 2, 3, 4]
    for _, dets, feats, labels in results:
        assert feats.shape == (4, 512)
        assert dets.boxes.shape[0] == CFG.max_faces
    stats = pipe.stats()
    assert stats["count"] >= 3  # ceil(5/2) batches
    assert stats["frames_per_sec"] > 0


def test_video_pipeline_labels_with_reference(models, rng):
    det, arc = models
    pipe = VideoPipeline(det, arc, CFG, batch=2, max_faces_embed=2)
    frames = [rng.integers(0, 256, (360, 480, 3), dtype=np.uint8) for _ in range(2)]
    ref = rng.normal(size=512).astype(np.float32)
    ref /= np.linalg.norm(ref)
    results = list(pipe.run(iter(frames), ref_feature=ref))
    for _, dets, feats, labels in results:
        assert len(labels) == 2
        for k, lab in enumerate(labels):
            if dets.valid[k]:
                assert lab in ("Match", "Unknown")
            else:
                assert lab == ""


def test_enroll_batch(models, rng):
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector, FaceRecognizer

    detector = FaceDetector(CFG)
    detector.load_model()
    recognizer = FaceRecognizer(CFG)
    recognizer.load_model()

    images = [
        rng.integers(0, 256, (240, 320, 3), dtype=np.uint8) for _ in range(4)
    ]
    names = [f"person{i}" for i in range(4)]
    bank, enrolled = enroll_batch(detector, recognizer, names, images)
    # random-weight detector fires on noise (scores saturate) → all enroll
    assert set(enrolled) <= set(names)
    assert len(bank) == len(enrolled)
    if len(bank):
        np.testing.assert_allclose(
            np.linalg.norm(bank.features, axis=1), 1.0, atol=1e-5
        )
        # identification round-trip: each enrolled face finds itself
        names_found, sims = bank.search(bank.features, top_k=1)
        assert [n[0] for n in names_found] == enrolled
