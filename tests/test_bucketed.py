"""Occupancy-adaptive bucketed embed (pipeline/bucketed.py): exact
parity with the dense fused program, speculation/correction mechanics.

The reference embeds only the faces the detector returned
(src/main.cpp:226); frames_to_features pays all K slots. The bucketed
path must give identical features while embedding only a compacted
bucket."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.pipeline.bucketed import (
    BucketedEmbedPipeline,
    default_buckets,
    detect_and_compact,
    embed_compacted,
)
from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
from facerecognizeonnx_tpu.utils.hostinit import init_on_host


SIZE = 128
K = 4


@pytest.fixture(scope="module")
def setup():
    from facerecognizeonnx_tpu.models import arcface, scrfd

    cfg = PipelineConfig(
        det_input_size=SIZE, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    rng = np.random.default_rng(7)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, SIZE, SIZE, 3), dtype=np.uint8)
    )
    return cfg, det, arc, frames


def test_default_buckets():
    assert default_buckets(1024) == (32, 64, 128, 256, 512, 1024)
    assert default_buckets(48) == (32, 48)
    assert default_buckets(8) == (8,)
    assert default_buckets(32) == (32,)


def _dense(cfg, det, arc, frames, valid_cap=None):
    return jax.jit(
        lambda v: frames_to_features(
            det, arc, v, cfg, max_faces_embed=K, valid_cap=valid_cap
        )
    )(frames)


@pytest.mark.parametrize("valid_cap", [None, 0, 1, 3])
def test_parity_with_fused(setup, valid_cap):
    cfg, det, arc, frames = setup
    dets_d, feats_d = _dense(cfg, det, arc, frames, valid_cap)

    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8],
        valid_cap=valid_cap,
    )
    dets_b, feats_b, n = pipe(frames)

    np.testing.assert_array_equal(
        np.asarray(dets_b.valid), np.asarray(dets_d.valid)
    )
    np.testing.assert_allclose(
        np.asarray(dets_b.boxes), np.asarray(dets_d.boxes), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feats_b), np.asarray(feats_d), atol=1e-5
    )
    if valid_cap is not None:
        assert n == valid_cap * frames.shape[0]


def test_parity_without_skip_invalid(setup):
    """skip_invalid_faces=False still packs the embed correctly (the
    invalid slots' warped garbage is computed but never embedded)."""
    import dataclasses

    cfg, det, arc, frames = setup
    cfg2 = dataclasses.replace(cfg, skip_invalid_faces=False)
    _, feats_d = _dense(cfg2, det, arc, frames, valid_cap=2)
    pipe = BucketedEmbedPipeline(
        det, arc, cfg2, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=2
    )
    _, feats_b, n = pipe(frames)
    assert n == 4
    np.testing.assert_allclose(
        np.asarray(feats_b), np.asarray(feats_d), atol=1e-5
    )


def test_compaction_is_valid_first_stable(setup):
    cfg, det, arc, frames = setup
    dets, crops_c, perm, valid_flat, counts = jax.jit(
        lambda v: detect_and_compact(det, v, cfg, K, valid_cap=1)
    )(frames)
    perm = np.asarray(perm)
    valid = np.asarray(valid_flat)
    np.testing.assert_array_equal(np.asarray(counts), [1, 1])  # per-frame
    n = int(np.asarray(counts).sum())
    assert n == frames.shape[0]  # 1 per frame
    # the first n entries of perm point at the valid slots, in order
    assert valid[perm[:n]].all()
    assert not valid[perm[n:]].any()
    assert (np.diff(perm[:n]) > 0).all()  # stable: original order kept
    assert (np.diff(perm[n:]) > 0).all()


def test_speculation_correction_is_exact(setup):
    """An underpredicted bucket is corrected in-step: output identical
    to the dense program, corrections counter increments."""
    cfg, det, arc, frames = setup
    _, feats_d = _dense(cfg, det, arc, frames, valid_cap=3)

    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=3
    )
    pipe._last_rate = 1.0  # force a bucket-2 speculation for 6 valid faces
    _, feats_b, n = pipe(frames)
    assert n == 6
    assert pipe.corrections == 1
    np.testing.assert_allclose(
        np.asarray(feats_b), np.asarray(feats_d), atol=1e-5
    )
    # steady state: next call speculates right, no new correction
    _, feats_b2, _ = pipe(frames)
    assert pipe.corrections == 1
    np.testing.assert_allclose(
        np.asarray(feats_b2), np.asarray(feats_d), atol=1e-5
    )


def test_zero_faces_returns_zero_features(setup):
    cfg, det, arc, frames = setup
    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=0
    )
    pipe._last_rate = 0.0  # steady zero-occupancy: embed never runs
    _, feats, n = pipe(frames)
    assert n == 0
    assert pipe.corrections == 0
    assert not pipe._embed_jit  # no embed program was even built
    np.testing.assert_array_equal(
        np.asarray(feats), np.zeros((2, K, cfg.feature_dim), np.float32)
    )


def test_video_pipeline_adaptive_matches_dense(setup, rng):
    """VideoPipeline(adaptive_embed=True) yields frame-for-frame
    identical detections and features to the dense program."""
    from facerecognizeonnx_tpu.pipeline.video import VideoPipeline

    cfg, det, arc, _ = setup
    frames = [
        rng.integers(0, 256, (SIZE, SIZE, 3), dtype=np.uint8)
        for _ in range(3)
    ]
    dense = VideoPipeline(det, arc, cfg, batch=2, max_faces_embed=K)
    adapt = VideoPipeline(
        det, arc, cfg, batch=2, max_faces_embed=K, adaptive_embed=True
    )
    out_d = list(dense.run(iter(frames)))
    out_a = list(adapt.run(iter(frames)))
    assert len(out_d) == len(out_a) == 3
    for (i_d, det_d, f_d, _), (i_a, det_a, f_a, _) in zip(out_d, out_a):
        assert i_d == i_a
        np.testing.assert_array_equal(
            np.asarray(det_a.valid), np.asarray(det_d.valid)
        )
        np.testing.assert_allclose(f_a, f_d, atol=1e-5)


def test_embed_compacted_masks_bucket_overhang(setup):
    """bucket > n_valid embeds some zero crops; their (nonzero) network
    outputs must be masked back to zero by the valid mask."""
    cfg, det, arc, frames = setup
    dets, crops_c, perm, valid_flat, counts = jax.jit(
        lambda v: detect_and_compact(det, v, cfg, K, valid_cap=1)
    )(frames)
    feats = jax.jit(
        lambda c, p, v: embed_compacted(arc, c, p, v, cfg, K, bucket=8)
    )(crops_c, perm, valid_flat)
    feats = np.asarray(feats)
    valid = np.asarray(valid_flat).reshape(2, K)
    assert np.abs(feats[~valid]).max() == 0.0
    norms = np.linalg.norm(feats[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_pad_frames_excluded_from_occupancy(setup):
    """start(n_frames=1): the pad frame's valid slots don't count toward
    n_valid or the speculation rate, and real-frame features are still
    exact (pads stack last in the compaction)."""
    cfg, det, arc, frames = setup
    _, feats_d = _dense(cfg, det, arc, frames, valid_cap=2)
    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=2
    )
    # frame 1 is a "pad" copy: only frame 0's 2 valid slots are real
    dets, feats, n = pipe.finish(pipe.start(frames, n_frames=1))
    assert n == 2
    assert pipe._last_rate == 2.0
    np.testing.assert_allclose(
        np.asarray(feats)[0], np.asarray(feats_d)[0], atol=1e-5
    )
    # next full batch speculates from the REAL per-frame rate: 2 faces x
    # 2 frames -> bucket 4, corrected only if short (it isn't: 4 valid)
    _, feats2, n2 = pipe(frames)
    assert n2 == 4 and pipe.corrections == 0
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(feats_d), atol=1e-5)


def test_zero_guess_then_faces_is_not_a_correction(setup):
    """Faces appearing after a zero-occupancy step re-run the embed but
    do NOT count as a correction (no speculative embed was discarded)."""
    cfg, det, arc, frames = setup
    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=1
    )
    pipe._last_rate = 0.0  # previous step saw no faces -> guess 0
    _, feats, n = pipe(frames)
    assert n == 2
    assert pipe.corrections == 0  # embed ran, nothing was discarded
    _, feats_d = _dense(cfg, det, arc, frames, valid_cap=1)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_d), atol=1e-5)


def test_fused_search_matches_dense_matches(setup):
    """search_top_k: program B fuses the gallery top-k and matches the
    dense frames_to_matches on valid slots (sims and indices)."""
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_matches

    cfg, det, arc, frames = setup
    r = np.random.default_rng(3)
    bank = r.normal(size=(16, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    bank_pad = jnp.asarray(np.concatenate([bank, np.zeros((16, 512), np.float32)]))
    n_rows = jnp.int32(16)

    dets_d, feats_d, sims_d, idx_d = jax.jit(
        lambda v, b, n: frames_to_matches(
            det, arc, v, b, n, cfg, max_faces_embed=K, top_k=3, valid_cap=2
        )
    )(frames, bank_pad, n_rows)

    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=2,
        search_top_k=3,
    )
    dets_b, feats_b, sims_b, idx_b, n = pipe(frames, bank_pad, n_rows)
    assert n == 4
    valid = np.asarray(dets_d.valid)[:, :K]
    np.testing.assert_allclose(
        np.asarray(feats_b), np.asarray(feats_d), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(idx_b)[valid], np.asarray(idx_d)[valid]
    )
    np.testing.assert_allclose(
        np.asarray(sims_b)[valid], np.asarray(sims_d)[valid], atol=1e-5
    )
    # bank omission / missing n_rows / unexpected bank all rejected
    with pytest.raises(ValueError):
        pipe.start(frames)
    with pytest.raises(ValueError, match="n_rows"):
        pipe.start(frames, bank_padded=bank_pad)
    with pytest.raises(ValueError):
        BucketedEmbedPipeline(det, arc, cfg, max_faces_embed=K).start(
            frames, bank_padded=bank_pad, n_rows=16
        )


def test_mesh_dp_matches_single_device(setup):
    """mesh: both programs run SPMD over a 2-device data axis; features
    and counts match the single-device bucketed path (and hence the
    dense program). The bucket covers the most-occupied shard."""
    from facerecognizeonnx_tpu.parallel.mesh import make_mesh

    cfg, det, arc, frames = setup
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    _, feats_d = _dense(cfg, det, arc, frames, valid_cap=3)
    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4], valid_cap=3,
        mesh=mesh,
    )
    dets, feats, n = pipe(frames)
    assert n == 6
    assert pipe.last_bucket == 4  # per-shard bucket covers 3 local faces
    # 1e-4: shard_map compiles with different XLA fusion choices than
    # the single-device program (same band as test_dp_service_matches)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_d), atol=1e-4)

    # fused search composes with the mesh (bank replicated)
    r = np.random.default_rng(5)
    bank = r.normal(size=(8, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    bank_pad = jnp.asarray(bank)
    pipe_f = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4], valid_cap=3,
        search_top_k=2, mesh=mesh,
    )
    _, feats_f, sims_f, idx_f, n_f = pipe_f(frames, bank_pad, jnp.int32(8))
    assert n_f == 6
    np.testing.assert_allclose(
        np.asarray(feats_f), np.asarray(feats_d), atol=1e-4
    )
    want = (np.asarray(feats_d).reshape(-1, 512) @ bank.T + 1.0) * 0.5
    order = np.argsort(-want, axis=1)[:, :2]
    np.testing.assert_array_equal(
        np.asarray(idx_f).reshape(-1, 2), order
    )


def test_two_phase_overlap(setup):
    """start() must not block on the host count: a second start() can be
    issued before the first finish(), and both resolve exactly."""
    cfg, det, arc, frames = setup
    _, feats_d = _dense(cfg, det, arc, frames, valid_cap=2)
    pipe = BucketedEmbedPipeline(
        det, arc, cfg, max_faces_embed=K, buckets=[2, 4, 8], valid_cap=2
    )
    h1 = pipe.start(frames)
    h2 = pipe.start(frames)  # in flight together (double buffering)
    _, f1, n1 = pipe.finish(h1)
    _, f2, n2 = pipe.finish(h2)
    assert n1 == n2 == 4
    np.testing.assert_allclose(np.asarray(f1), np.asarray(feats_d), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2), np.asarray(feats_d), atol=1e-5)
