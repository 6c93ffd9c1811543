"""Face tracking + embedding cache (pipeline/track.py).

The reference re-embeds every face of every frame (src/main.cpp:214-257);
the tracker is the framework extension that makes video identify
embed-sparse. Host logic is tested exactly; the pipeline test uses the
random-weight models on a REPEATED frame, where detections are
deterministic, so tracks must persist and the embed cache must hold."""

import numpy as np
import pytest

from facerecognizeonnx_tpu.pipeline.track import (
    IOUTracker,
    Track,
    TrackingVideoPipeline,
    iou_matrix,
)


def box(x, y, w=10.0, h=10.0):
    return np.array([x, y, x + w, y + h], np.float32)


def test_iou_matrix_values():
    a = np.stack([box(0, 0), box(100, 100)])
    b = np.stack([box(0, 0), box(5, 0), box(200, 200)])
    m = iou_matrix(a, b)
    assert m.shape == (2, 3)
    assert m[0, 0] == pytest.approx(1.0)
    # +1 convention (reference iou): inter 6*11, areas 11*11 each
    assert m[0, 1] == pytest.approx(66.0 / (121.0 + 121.0 - 66.0))
    assert m[0, 2] == 0.0
    assert m[1, 2] == 0.0


def test_iou_matrix_degenerate_box_self_match():
    """A zero-area box must match ITSELF at 1.0 (the +1 convention) —
    otherwise re-detected degenerate boxes churn new tracks forever."""
    d = np.array([[7.0, 9.0, 7.0, 9.0]], np.float32)
    assert iou_matrix(d, d)[0, 0] == pytest.approx(1.0)


def test_tracker_persistent_ids_and_misses():
    tr = IOUTracker(iou_threshold=0.3, max_misses=2)
    t0 = tr.update(np.stack([box(0, 0), box(50, 50)]), np.array([0.9, 0.8]))
    assert [t.track_id for t in t0] == [0, 1]
    # both move slightly → same ids, in swapped detection order
    t1 = tr.update(np.stack([box(51, 51), box(1, 1)]), np.array([0.8, 0.9]))
    assert [t.track_id for t in t1] == [1, 0]
    # second target vanishes for 2 frames (within max_misses) then returns
    tr.update(np.stack([box(2, 2)]), np.array([0.9]))
    tr.update(np.stack([box(3, 3)]), np.array([0.9]))
    t4 = tr.update(np.stack([box(52, 52), box(4, 4)]), np.array([0.7, 0.9]))
    assert [t.track_id for t in t4] == [1, 0]
    # now it vanishes past max_misses → a fresh id on return
    for _ in range(4):
        tr.update(np.stack([box(5, 5)]), np.array([0.9]))
    t9 = tr.update(np.stack([box(52, 52), box(5, 5)]), np.array([0.7, 0.9]))
    assert t9[1].track_id == 0
    assert t9[0].track_id == 2  # id 1 was dropped


def test_tracker_empty_frames():
    tr = IOUTracker(max_misses=1)
    tr.update(np.stack([box(0, 0)]), np.array([0.9]))
    tr.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
    assert tr.tracks and tr.tracks[0].misses == 1
    tr.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
    assert not tr.tracks


def test_track_needs_embed_refresh():
    t = Track(0, box(0, 0), 0.9)
    assert t.needs_embed(4)  # no feature yet
    t.feature = np.ones(512, np.float32)
    t.frames_since_embed = 3
    assert not t.needs_embed(4)
    t.frames_since_embed = 4
    assert t.needs_embed(4)


@pytest.fixture(scope="module")
def tiny_models():
    import jax

    from facerecognizeonnx_tpu.models import arcface, scrfd

    det = scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(0)))
    arc = arcface.fold_inference_params(
        arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    return det, arc


def test_tracking_pipeline_embed_sparse(tiny_models):
    """Identical repeated frames → identical detections → stable tracks
    → only the first micro-batch embeds; later batches ride the cache."""
    from facerecognizeonnx_tpu.config import PipelineConfig

    det, arc = tiny_models
    cfg = PipelineConfig(det_input_size=192, compute_dtype="float32", pre_nms_topk=64)
    pipe = TrackingVideoPipeline(
        det, arc, cfg, batch=2, max_faces_embed=4, refresh_every=100
    )
    frame = np.random.default_rng(7).integers(
        0, 256, (160, 200, 3), dtype=np.uint8
    )
    ref = np.zeros(512, np.float32)
    n_frames = 6
    outs = list(pipe.run(iter([frame] * n_frames), ref_feature=ref))
    assert len(outs) == n_frames
    s = pipe.stats()
    assert s["total_frames"] == n_frames
    # random-weight detector fires on noise (same contract as test_cli)
    idx0, dets0, tracks0 = outs[0]
    assert dets0["valid"].any()
    # embed ran on the first micro-batch only (all tracks cached after)
    assert 0 < s["embed_fraction"] <= 2 / 6 + 1e-9
    # ids persist across ALL frames (identical detections)
    ids = [
        sorted(t.track_id for t in tr if t is not None)
        for _, _, tr in outs
    ]
    assert all(i == ids[0] for i in ids)
    # labels resolved from the cached feature on every later frame
    for _, _, tr in outs[2:]:
        for t in tr:
            if t is not None:
                assert t.label in ("Match", "Unknown")
                assert t.feature is not None


def test_tracking_pipeline_refresh_counts(tiny_models):
    """refresh_every=2 forces periodic re-embeds: the embed fraction
    rises accordingly (cache still beats embed-every-frame)."""
    from facerecognizeonnx_tpu.config import PipelineConfig

    det, arc = tiny_models
    cfg = PipelineConfig(det_input_size=192, compute_dtype="float32", pre_nms_topk=64)
    pipe = TrackingVideoPipeline(
        det, arc, cfg, batch=2, max_faces_embed=4, refresh_every=2
    )
    frame = np.random.default_rng(7).integers(
        0, 256, (160, 200, 3), dtype=np.uint8
    )
    list(pipe.run(iter([frame] * 8)))
    s = pipe.stats()
    assert s["embed_fraction"] > 0.3  # refreshing often
    assert s["embed_frames"] < s["total_frames"]  # but never every frame


def test_tracking_pipeline_gallery_labels(tiny_models):
    """bank= labels each track with its 1:N top-1 identity; the batched
    search runs only for refreshed (label_dirty) tracks."""
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    det, arc = tiny_models
    cfg = PipelineConfig(det_input_size=192, compute_dtype="float32",
                         pre_nms_topk=64)
    pipe = TrackingVideoPipeline(
        det, arc, cfg, batch=2, max_faces_embed=4, refresh_every=100
    )
    frame = np.random.default_rng(7).integers(
        0, 256, (160, 200, 3), dtype=np.uint8
    )
    # run once WITHOUT a bank to harvest the real track features
    outs = list(pipe.run(iter([frame] * 2)))
    feats = {
        t.track_id: t.feature
        for _, _, tr in outs for t in tr if t is not None
    }
    assert feats

    # gallery with the real features enrolled under known names + chaff
    bank = GalleryBank()
    rng = np.random.default_rng(11)
    for tid, f in feats.items():
        bank.add(f"track{tid}", f)
    bank.add_batch(
        ["chaff1", "chaff2"], rng.normal(size=(2, 512)).astype(np.float32)
    )

    pipe2 = TrackingVideoPipeline(
        det, arc, cfg, batch=2, max_faces_embed=4, refresh_every=100
    )
    outs2 = list(pipe2.run(iter([frame] * 4), bank=bank))
    assert len(outs2) == 4
    labeled = [
        t for _, _, tr in outs2 for t in tr
        if t is not None and t.feature is not None
    ]
    assert labeled
    # identical frames → identical features → every track matches its
    # own enrolled identity (sim = 1.0 > 0.6) and labels are sticky on
    # cached frames (label_dirty cleared after one search)
    for t in labeled:
        assert t.label.startswith("track"), t.label
        assert not t.label_dirty


def test_tracking_pipeline_adaptive_matches_dense(tiny_models):
    """adaptive_embed=True: refresh frames run through the bucketed
    pipeline (the low-occupancy case it exists for) — identical track
    labels/ids and matching cached features vs the dense refresh path,
    while the embed bucket stays far below the dense batch*K crops
    (VERDICT r4 item 3)."""
    from facerecognizeonnx_tpu.config import PipelineConfig

    det, arc = tiny_models
    cfg = PipelineConfig(det_input_size=192, compute_dtype="float32",
                         pre_nms_topk=64)
    frame = np.random.default_rng(7).integers(
        0, 256, (160, 200, 3), dtype=np.uint8
    )
    ref = np.zeros(512, np.float32)
    runs = {}
    for adaptive in (False, True):
        pipe = TrackingVideoPipeline(
            det, arc, cfg, batch=2, max_faces_embed=4, refresh_every=3,
            adaptive_embed=adaptive,
        )
        outs = list(pipe.run(iter([frame] * 6), ref_feature=ref))
        runs[adaptive] = (outs, pipe)
    (dense_outs, dense_pipe), (ad_outs, ad_pipe) = runs[False], runs[True]
    assert len(dense_outs) == len(ad_outs) == 6
    # the bucketed path really served the refreshes (at this toy size
    # batch*K=8 < MIN_BUCKET, so the single bucket equals the total —
    # the bucket-shrink economics are benched at production size)
    assert ad_pipe.bucketed.steps > 0
    assert 0 < ad_pipe.bucketed.last_bucket <= 2 * 4
    assert ad_pipe.stats()["embed_frames"] == dense_pipe.stats()["embed_frames"]
    for (i_d, det_d, tr_d), (i_a, det_a, tr_a) in zip(dense_outs, ad_outs):
        assert i_d == i_a
        np.testing.assert_array_equal(det_a["valid"], det_d["valid"])
        for td, ta in zip(tr_d, tr_a):
            assert (td is None) == (ta is None)
            if td is None:
                continue
            assert td.track_id == ta.track_id and td.label == ta.label
            np.testing.assert_allclose(ta.feature, td.feature, atol=1e-4)
