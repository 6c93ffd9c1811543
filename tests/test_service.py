"""Micro-batching identify service tests."""

import threading

import jax
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.match.gallery import GalleryBank
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.pipeline.service import IdentifyService
from facerecognizeonnx_tpu.utils.hostinit import init_on_host


@pytest.fixture(scope="module")
def service():
    cfg = PipelineConfig(compute_dtype="float32")
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(lambda: arcface.init_params(jax.random.PRNGKey(1)))
    bank = GalleryBank()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(10, 512)).astype(np.float32)
    bank.add_batch([f"person{i}" for i in range(10)], feats)
    svc = IdentifyService(det, arc, bank, cfg, max_batch=4, batch_window_ms=50)
    yield svc
    svc.close()


def test_single_request(service, rng):
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
    # generous timeout: the first call compiles the fused program, and CI
    # machines may be running TPU benches concurrently (observed flake:
    # 120s default timed out while XLA compile threads fought for cores)
    res = service.identify(img, top_k=3, timeout=600.0)
    assert res.boxes.shape == (8, 4)
    assert res.sims.shape == (8, 3)
    k = int(res.valid.sum())
    for j in range(k):
        assert len(res.names[j]) == 3
        assert all(n.startswith("person") for n in res.names[j])


def test_concurrent_requests_batch(service, rng):
    imgs = [
        rng.integers(0, 256, (240, 320, 3), dtype=np.uint8) for _ in range(6)
    ]
    results = [None] * 6

    def call(i):
        results[i] = service.identify(imgs[i])

    before = service.stats()["batches"]
    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    stats = service.stats()
    # 6 requests within the window must have coalesced into < 6 batches
    assert stats["batches"] - before < 6
    assert stats["avg_batch"] > 1.0


def test_async_future(service, rng):
    img = rng.integers(0, 256, (200, 200, 3), dtype=np.uint8)
    fut = service.identify_async(img)
    res = fut.result(timeout=120)
    assert res.scores.shape == (8,)
