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


def test_http_server_roundtrip(rng):
    """HTTP front-end (pipeline/server.py): enroll + identify + health
    over real sockets, JSON contract intact."""
    import http.client
    import json as jsonlib
    import threading

    import cv2

    from facerecognizeonnx_tpu.pipeline.api import FaceDetector, FaceRecognizer
    from facerecognizeonnx_tpu.pipeline.server import make_server

    cfg = PipelineConfig(compute_dtype="float32", rec_arch="iresnet18")
    detector = FaceDetector(cfg)
    detector.load_model()
    recognizer = FaceRecognizer(cfg)
    recognizer.load_model()
    bank = GalleryBank()
    server = make_server(detector, recognizer, bank, port=0,
                         batch_window_ms=5)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        body = enc.tobytes()

        def post(path):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
            conn.request("POST", path, body=body,
                         headers={"Content-Length": str(len(body))})
            r = conn.getresponse()
            return r.status, jsonlib.loads(r.read())

        def get(path):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("GET", path)
            r = conn.getresponse()
            return r.status, jsonlib.loads(r.read())

        status, health = get("/healthz")
        assert status == 200 and health["status"] == "ok"

        # random-weight detector fires on noise → enroll succeeds
        status, resp = post("/enroll?name=alice")
        assert status == 200 and resp["enrolled"] and resp["gallery_size"] == 1

        status, resp = post("/identify?top_k=1")
        assert status == 200
        assert isinstance(resp["faces"], list) and resp["faces"]
        face = resp["faces"][0]
        assert len(face["box"]) == 4 and face["names"] == ["alice"]

        status, resp = post("/enroll")  # missing name
        assert status == 400

        status, stats = get("/stats")
        assert status == 200 and stats["requests"] >= 1
        # rolling enqueue→result latency summary (serving SLO surface)
        lat = stats["latency_ms"]
        assert lat["window"] >= 1
        assert 0 < lat["p50"] <= lat["p90"] <= lat["p99"]

        # Prometheus exposition of the same counters
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/metrics")
        r = conn.getresponse()
        text = r.read().decode()
        assert r.status == 200
        assert r.getheader("Content-Type").startswith("text/plain")
        assert "# TYPE frt_requests counter" in text
        assert "frt_gallery_size 1" in text
        assert "# TYPE frt_latency_ms summary" in text
        assert 'frt_latency_ms{quantile="0.99"}' in text
        assert "frt_latency_ms_count" in text

        def delete(path):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("DELETE", path)
            r = conn.getresponse()
            return r.status, jsonlib.loads(r.read())

        status, resp = delete("/enroll?name=alice")
        assert status == 200 and resp["removed"] == 1
        assert resp["gallery_size"] == 0
        status, resp = delete("/enroll?name=alice")  # already gone
        assert status == 404 and resp["removed"] == 0
        status, resp = delete("/enroll")  # missing name
        assert status == 400
    finally:
        server.shutdown()
        server.frt_service.close()


def test_http_server_auth_and_stream(rng):
    """Bearer-token auth (401 without/with-wrong token, constant-time
    compare) + the /identify_stream endpoint: length-prefixed frames in,
    chunked NDJSON per-frame results out, bad frames flagged in-stream."""
    import http.client
    import json as jsonlib
    import struct
    import threading

    import cv2

    from facerecognizeonnx_tpu.pipeline.api import FaceDetector, FaceRecognizer
    from facerecognizeonnx_tpu.pipeline.server import make_server

    cfg = PipelineConfig(compute_dtype="float32", rec_arch="iresnet18")
    detector = FaceDetector(cfg)
    detector.load_model()
    recognizer = FaceRecognizer(cfg)
    recognizer.load_model()
    bank = GalleryBank()
    server = make_server(detector, recognizer, bank, port=0,
                         batch_window_ms=5, auth_token="s3cret")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        def get(path, token=None):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            headers = {"Authorization": f"Bearer {token}"} if token else {}
            conn.request("GET", path, headers=headers)
            r = conn.getresponse()
            return r.status, jsonlib.loads(r.read())

        assert get("/healthz")[0] == 401
        assert get("/healthz", token="wrong")[0] == 401
        status, health = get("/healthz", token="s3cret")
        assert status == 200 and health["status"] == "ok"

        # ---- streaming: 2 good frames + 1 undecodable, zero-terminated
        img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
        ok, enc = cv2.imencode(".jpg", img)
        assert ok
        good = enc.tobytes()
        frames = [good, b"not an image", good]
        body = b"".join(
            struct.pack(">I", len(f)) + f for f in frames
        ) + struct.pack(">I", 0)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request(
            "POST", "/identify_stream?top_k=1", body=body,
            headers={"Authorization": "Bearer s3cret",
                     "Content-Length": str(len(body))},
        )
        r = conn.getresponse()
        assert r.status == 200
        assert r.getheader("Content-Type") == "application/x-ndjson"
        lines = [jsonlib.loads(l) for l in r.read().splitlines() if l.strip()]
        assert [l["frame"] for l in lines] == [0, 1, 2]  # frame order kept
        assert "error" in lines[1]
        for l in (lines[0], lines[2]):  # random-weight det fires on noise
            assert isinstance(l["faces"], list)
            assert all(len(f["box"]) == 4 for f in l["faces"])

        # unauthorized stream is rejected before any frame is processed
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("POST", "/identify_stream", body=body,
                     headers={"Content-Length": str(len(body))})
        assert conn.getresponse().status == 401

        # ---- client SDK (pipeline/client.py) against the same server
        from facerecognizeonnx_tpu.pipeline.client import (
            IdentifyClient,
            ServiceError,
        )

        client = IdentifyClient("127.0.0.1", port, token="s3cret",
                                timeout=600)
        assert client.healthz()["status"] == "ok"
        assert client.enroll("bob", good)["enrolled"]
        faces = client.identify(good, top_k=1)
        assert faces and faces[0]["names"] == ["bob"]
        lines = list(client.identify_stream(iter(frames), top_k=1))
        assert [l["frame"] for l in lines] == [0, 1, 2]
        assert "error" in lines[1] and "faces" in lines[0]
        assert client.remove("bob")["removed"] == 1
        with pytest.raises(ServiceError) as ei:
            client.remove("bob")  # already gone → 404
        assert ei.value.status == 404
        with pytest.raises(ServiceError) as ei:
            IdentifyClient("127.0.0.1", port, timeout=60).healthz()
        assert ei.value.status == 401
        bad_stream = IdentifyClient("127.0.0.1", port, timeout=60)
        with pytest.raises(ServiceError):
            list(bad_stream.identify_stream(iter(frames)))
    finally:
        server.shutdown()
        server.frt_service.close()


def test_http_500_on_handler_exception():
    """Handler exceptions must surface as a 500 JSON reply, not a silent
    connection drop (ThreadingHTTPServer swallows them otherwise — the
    client would see RemoteDisconnected and the operator nothing)."""
    import http.client
    import json as jsonlib
    import threading
    from http.server import ThreadingHTTPServer

    import cv2

    from facerecognizeonnx_tpu.pipeline.server import _Handler

    class Boom:
        def identify(self, *a, **k):
            raise RuntimeError("boom")

        def stats(self):
            raise RuntimeError("boom")

    handler = type(
        "H", (_Handler,),
        {"service": Boom(), "bank": [], "auth_token": None},
    )
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/stats")
        r = conn.getresponse()
        assert r.status == 500
        assert "boom" in jsonlib.loads(r.read())["error"]

        ok, enc = cv2.imencode(".png", np.zeros((8, 8, 3), np.uint8))
        body = enc.tobytes()
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/identify", body=body,
                     headers={"Content-Length": str(len(body))})
        r = conn.getresponse()
        assert r.status == 500
        assert "RuntimeError" in jsonlib.loads(r.read())["error"]

        # healthz doesn't touch the broken service: still 200
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        assert conn.getresponse().status == 200
    finally:
        server.shutdown()


def test_sharded_service_matches_dense(rng):
    """sharded=True routes bank.search through the mesh-sharded top-k
    (parallel/sharded_ops) — same results as the dense path on the
    8-virtual-device CPU mesh (serve --sharded)."""
    cfg = PipelineConfig(compute_dtype="float32")
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(lambda: arcface.init_params(jax.random.PRNGKey(1)))
    bank = GalleryBank()
    feats = np.random.default_rng(1).normal(size=(16, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bank.add_batch([f"person{i}" for i in range(16)], feats)
    img = rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)

    results = {}
    for sharded in (False, True):
        svc = IdentifyService(
            det, arc, bank, cfg, max_batch=4, batch_window_ms=50,
            sharded=sharded,
        )
        try:
            results[sharded] = svc.identify(img, top_k=3, timeout=600.0)
        finally:
            svc.close()

    dense, shard = results[False], results[True]
    assert dense.names == shard.names
    np.testing.assert_allclose(dense.sims, shard.sims, atol=1e-5)
    np.testing.assert_allclose(dense.boxes, shard.boxes, atol=1e-5)


def test_aot_service_matches_traced(rng, tmp_path):
    """IdentifyService(aot=bundle) serves identical results through the
    version-pinned exported program (serve --aot)."""
    from facerecognizeonnx_tpu.pipeline.aot import save_bundle

    cfg = PipelineConfig(
        det_input_size=128, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    path = str(tmp_path / "svc.frtz")
    save_bundle(path, det, arc, cfg, batch=4, max_faces_embed=8)

    bank = GalleryBank()
    feats = np.random.default_rng(1).normal(size=(12, 512)).astype(np.float32)
    bank.add_batch([f"person{i}" for i in range(12)], feats)
    img = rng.integers(0, 256, (96, 120, 3), dtype=np.uint8)

    results = {}
    for key, kwargs in (
        ("traced", dict(cfg=cfg, max_batch=4)),
        ("aot", dict(aot=path)),
    ):
        svc = IdentifyService(det, arc, bank, batch_window_ms=50, **kwargs)
        try:
            assert svc.max_batch == 4 and svc.cfg.det_input_size == 128
            results[key] = svc.identify(img, top_k=2, timeout=600.0)
        finally:
            svc.close()

    traced, aot = results["traced"], results["aot"]
    np.testing.assert_array_equal(traced.valid, aot.valid)
    assert traced.names == aot.names
    np.testing.assert_allclose(traced.sims, aot.sims, atol=1e-4)
    np.testing.assert_allclose(traced.boxes, aot.boxes, atol=1e-2)


def test_dp_service_matches_local(rng):
    """IdentifyService(mesh=4): micro-batches shard over a 4-device data
    axis (serve --dp 4) and serve results identical to the single-device
    program — including when concurrent callers coalesce into one
    sharded dispatch. Also pins the max_batch round-up and the aot+mesh
    exclusivity contract."""
    cfg = PipelineConfig(
        det_input_size=128, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16, score_threshold=0.3,  # random-weight scrfd fires on noise
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    bank = GalleryBank()
    feats = np.random.default_rng(1).normal(size=(12, 512)).astype(np.float32)
    bank.add_batch([f"person{i}" for i in range(12)], feats)
    imgs = [
        rng.integers(0, 256, (96, 120, 3), dtype=np.uint8) for _ in range(5)
    ]

    svc_dp = IdentifyService(
        det, arc, bank, cfg, max_batch=3, batch_window_ms=200, mesh=4
    )
    svc_local = IdentifyService(
        det, arc, bank, cfg, max_batch=4, batch_window_ms=5
    )
    try:
        assert svc_dp.max_batch == 4  # rounded up to the data-axis size
        # concurrent submission so requests coalesce into sharded batches
        futures = [svc_dp.identify_async(im, top_k=2) for im in imgs]
        dp_results = [f.result(timeout=600.0) for f in futures]
        assert svc_dp.stats()["batches"] < len(imgs)  # proves coalescing
        assert any(r.valid.sum() > 0 for r in dp_results)  # non-vacuous
        for im, got in zip(imgs, dp_results):
            want = svc_local.identify(im, top_k=2, timeout=600.0)
            np.testing.assert_array_equal(want.valid, got.valid)
            assert want.names == got.names
            np.testing.assert_allclose(want.sims, got.sims, atol=1e-4)
            np.testing.assert_allclose(want.boxes, got.boxes, atol=1e-2)
    finally:
        svc_dp.close()
        svc_local.close()

    with pytest.raises(ValueError):
        IdentifyService(det, arc, bank, cfg, aot="x.frtz", mesh=4)


def test_device_bank_padded_buckets():
    """Power-of-two padded device bank for the fused identify: empty
    bank sits in the 64-row bucket, growth past a bucket doubles it,
    pad rows are zero and real rows match the host bank."""
    bank = GalleryBank()
    dev, n, names = bank.device_bank_padded()
    assert dev.shape == (64, 512) and n == 0 and names == []

    r = np.random.default_rng(0)
    feats = r.normal(size=(70, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bank.add_batch([f"p{i}" for i in range(70)], feats)
    dev, n, names = bank.device_bank_padded()
    assert dev.shape == (128, 512) and n == 70 and len(names) == 70
    np.testing.assert_allclose(np.asarray(dev[:70]), feats, atol=1e-6)
    assert np.all(np.asarray(dev[70:]) == 0)
    # per-store-version cache: same object back on a second call
    assert bank.device_bank_padded()[0] is dev


def test_fused_search_service_matches_default(rng):
    """fuse_search=True (serve --fuse-search): identify runs as ONE
    device dispatch with the gallery top-k fused into the program and
    returns results identical to the two-dispatch default — including
    after an enroll that stays inside the gallery bucket (n_rows is
    traced, so the compiled program is reused). The dp composition
    (mesh=2 + fuse_search: ONE SPMD program) is held to the same
    oracle; exclusivity with sharded/aot is pinned."""
    cfg = PipelineConfig(
        det_input_size=128, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16, score_threshold=0.3,  # random-weight scrfd fires on noise
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    bank = GalleryBank()
    r = np.random.default_rng(1)
    feats = r.normal(size=(12, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bank.add_batch([f"person{i}" for i in range(12)], feats)
    img = rng.integers(0, 256, (96, 120, 3), dtype=np.uint8)

    svc_f = IdentifyService(
        det, arc, bank, cfg, max_batch=2, batch_window_ms=5,
        fuse_search=True, search_top_k=3,
    )
    svc_df = IdentifyService(  # dp + fused search in ONE SPMD program
        det, arc, bank, cfg, max_batch=2, batch_window_ms=5,
        fuse_search=True, search_top_k=3, mesh=2,
    )
    svc_d = IdentifyService(det, arc, bank, cfg, max_batch=2, batch_window_ms=5)
    try:
        for round_label in ("initial", "after-enroll"):
            want = svc_d.identify(img, top_k=3, timeout=600.0)
            assert want.valid.sum() > 0  # non-vacuous: faces matched
            for svc in (svc_f, svc_df):
                got = svc.identify(img, top_k=3, timeout=600.0)
                np.testing.assert_array_equal(want.valid, got.valid)
                assert want.names == got.names, round_label
                np.testing.assert_allclose(want.sims, got.sims, atol=1e-5)
                # boxes are pixel-scale (~100s); the dp program compiles
                # through shard_map with different XLA fusion choices, so
                # allow last-ulp float32 drift (observed max ~3e-5 abs,
                # ~9e-7 rel)
                np.testing.assert_allclose(
                    want.boxes, got.boxes, rtol=1e-5, atol=1e-4
                )
            if round_label == "initial":
                # same 64-row bucket (13 < 64): the fused program is reused
                extra = r.normal(size=(512,)).astype(np.float32)
                bank.add("extra", extra / np.linalg.norm(extra))
        # a request WIDER than the baked search_top_k must not silently
        # shrink: it falls back to the host-side gallery search and
        # matches default serving at the full width
        want5 = svc_d.identify(img, top_k=5, timeout=600.0)
        wide = svc_f.identify(img, top_k=5, timeout=600.0)
        k = int(wide.valid.sum())
        assert k > 0 and all(len(wide.names[j]) == 5 for j in range(k))
        assert want5.names == wide.names
        np.testing.assert_allclose(want5.sims, wide.sims, atol=1e-5)
    finally:
        svc_f.close()
        svc_df.close()
        svc_d.close()

    for bad in (dict(sharded=True), dict(aot="x.frtz")):
        with pytest.raises(ValueError):
            IdentifyService(det, arc, bank, cfg, fuse_search=True, **bad)


def test_adaptive_service_matches_dense(rng):
    """adaptive_embed=True (serve --adaptive-embed): the service serves
    through the occupancy-adaptive bucketed pipeline — identical
    results to the dense service, while embedding only the detected
    faces' bucket. The fuse_search and mesh (dp) compositions are held
    to the same oracle; aot exclusivity is pinned. (VERDICT r4 item 1:
    the 2/8-occupancy win must reach the serving surface.)"""
    cfg = PipelineConfig(
        det_input_size=128, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16, score_threshold=0.3,  # random-weight scrfd fires on noise
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    bank = GalleryBank()
    feats = np.random.default_rng(1).normal(size=(12, 512)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bank.add_batch([f"person{i}" for i in range(12)], feats)
    imgs = [
        rng.integers(0, 256, (96, 120, 3), dtype=np.uint8) for _ in range(3)
    ]

    svc_d = IdentifyService(det, arc, bank, cfg, max_batch=2, batch_window_ms=5)
    variants = {
        "adaptive": dict(adaptive_embed=True),
        "adaptive+fuse": dict(adaptive_embed=True, fuse_search=True,
                              search_top_k=3),
        "adaptive+dp": dict(adaptive_embed=True, mesh=2),
        "adaptive+fuse+dp": dict(adaptive_embed=True, fuse_search=True,
                                 search_top_k=3, mesh=2),
    }
    try:
        wants = [svc_d.identify(im, top_k=3, timeout=600.0) for im in imgs]
        assert any(w.valid.sum() > 0 for w in wants)  # non-vacuous
        for label, kwargs in variants.items():
            svc = IdentifyService(
                det, arc, bank, cfg, max_batch=2, batch_window_ms=5, **kwargs
            )
            try:
                for im, want in zip(imgs, wants):
                    got = svc.identify(im, top_k=3, timeout=600.0)
                    np.testing.assert_array_equal(want.valid, got.valid)
                    assert want.names == got.names, label
                    np.testing.assert_allclose(
                        want.sims, got.sims, atol=1e-4, err_msg=label
                    )
                    np.testing.assert_allclose(
                        want.boxes, got.boxes, rtol=1e-5, atol=1e-4,
                        err_msg=label,
                    )
                # the bucketed pipeline really served these requests
                assert svc._bucketed.steps >= len(imgs)
            finally:
                svc.close()
    finally:
        svc_d.close()

    with pytest.raises(ValueError):
        IdentifyService(det, arc, bank, cfg, adaptive_embed=True, aot="x.frtz")


def test_pipelined_worker_drains_on_close(rng):
    """The worker holds one dispatched-but-unresolved batch in flight;
    close() (and the shutdown sentinel arriving mid-gather) must still
    resolve every outstanding future — no request may hang or be
    dropped at shutdown."""
    cfg = PipelineConfig(
        det_input_size=128, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    bank = GalleryBank()
    svc = IdentifyService(
        det, arc, bank, cfg, max_batch=2, batch_window_ms=5,
        adaptive_embed=True,
    )
    imgs = [
        rng.integers(0, 256, (96, 120, 3), dtype=np.uint8) for _ in range(5)
    ]
    svc.identify(imgs[0], timeout=600.0)  # compile off the clock
    # a burst larger than one batch, then immediate close: the worker
    # may be holding a pending batch when the sentinel lands
    futs = [svc.identify_async(im) for im in imgs]
    svc.close()
    for f in futs:
        res = f.result(timeout=60.0)  # resolved, not hung
        assert res.boxes.shape[0] == 8
    assert svc.stats()["requests"] >= len(imgs) + 1
