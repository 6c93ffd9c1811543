"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh
(SURVEY.md §4.4: pjit/shard_map exercised without a TPU pod)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.sharded_ops import (
    sharded_batch_embed,
    sharded_topk_search,
)


def _normed(rng, n, d=512):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(("data", "model"), (4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(("model",))
    assert mesh1.shape == {"model": 8}
    with pytest.raises(ValueError):
        make_mesh(("data",), (3,))


def test_sharded_topk_matches_dense(rng):
    gallery = _normed(rng, 1000)
    queries = _normed(rng, 4)
    sims, idx = sharded_topk_search(queries, gallery, top_k=5)
    sims, idx = np.asarray(sims), np.asarray(idx)

    dense = (queries @ gallery.T + 1.0) / 2.0
    ref_idx = np.argsort(-dense, axis=1)[:, :5]
    ref_sims = np.take_along_axis(dense, ref_idx, axis=1)
    np.testing.assert_allclose(sims, ref_sims, atol=1e-5)
    np.testing.assert_array_equal(idx, ref_idx)


def test_sharded_topk_gallery_not_divisible(rng):
    # 1003 rows over 8 shards → padding rows must never appear in results
    gallery = _normed(rng, 1003)
    queries = _normed(rng, 3)
    sims, idx = sharded_topk_search(queries, gallery, top_k=7)
    assert np.asarray(idx).max() < 1003
    dense = (queries @ gallery.T + 1.0) / 2.0
    ref_idx = np.argsort(-dense, axis=1)[:, :7]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_sharded_topk_k_larger_than_gallery(rng):
    gallery = _normed(rng, 3)
    queries = _normed(rng, 2)
    sims, idx = sharded_topk_search(queries, gallery, top_k=10)
    assert np.asarray(sims).shape == (2, 3)


def test_gallery_bank_sharded_search(rng):
    from facerecognizeonnx_tpu.match.gallery import GalleryBank

    bank = GalleryBank()
    feats = _normed(rng, 50)
    bank.add_batch([f"id{i}" for i in range(50)], feats)
    q = feats[7:9]
    names_s, sims_s = bank.search(q, top_k=3, sharded=True)
    names_d, sims_d = bank.search(q, top_k=3, sharded=False)
    assert names_s == names_d
    np.testing.assert_allclose(sims_s, sims_d, atol=1e-5)
    assert names_s[0][0] == "id7" and names_s[1][0] == "id8"
    assert sims_s[0][0] == pytest.approx(1.0, abs=1e-5)


def test_sharded_batch_embed_matches_local(rng):
    from facerecognizeonnx_tpu.embed.pipeline import embed_crops
    from facerecognizeonnx_tpu.models import arcface
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    cfg = PipelineConfig(compute_dtype="float32")
    params = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")
    )
    crops = rng.integers(0, 256, (10, 112, 112, 3)).astype(np.uint8)
    sharded = np.asarray(sharded_batch_embed(params, crops, cfg))
    local = np.asarray(embed_crops(params, jnp.asarray(crops), cfg))
    assert sharded.shape == (10, 512)
    np.testing.assert_allclose(sharded, local, atol=2e-2)
    cos = (sharded * local).sum(-1)
    assert cos.min() > 1 - 1e-4


def test_sharded_fused_pipeline_matches_local(rng):
    """Data-parallel fused detect→align→embed over the mesh equals the
    single-device program frame-for-frame (params replicated, batch
    sharded; padding frames are dropped)."""
    from facerecognizeonnx_tpu.models import arcface, scrfd
    from facerecognizeonnx_tpu.parallel.sharded_ops import (
        sharded_frames_to_features,
    )
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    size = 128
    cfg = PipelineConfig(
        det_input_size=size, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    frames = rng.integers(0, 256, (3, size, size, 3)).astype(np.uint8)  # pads to 8

    dets_s, feats_s = sharded_frames_to_features(
        det, arc, frames, cfg, max_faces_embed=4
    )
    dets_l, feats_l = jax.jit(
        lambda v: frames_to_features(det, arc, v, cfg, max_faces_embed=4)
    )(jnp.asarray(frames))

    np.testing.assert_array_equal(
        np.asarray(dets_s.valid), np.asarray(dets_l.valid)
    )
    np.testing.assert_allclose(
        np.asarray(dets_s.boxes), np.asarray(dets_l.boxes), atol=1e-3
    )
    assert np.asarray(feats_s).shape == (3, 4, 512)
    np.testing.assert_allclose(
        np.asarray(feats_s), np.asarray(feats_l), atol=2e-3
    )


def test_sharded_fused_pipeline_quantized(rng):
    """A w8a8 QuantizedRecognizer threads through the shard_map'd fused
    pipeline (its (params, qstate) arrays ship as pytrees and re-wrap
    inside the traced region) and matches the local quantized program."""
    import jax.numpy as jnp

    from facerecognizeonnx_tpu.models import arcface, quant, scrfd
    from facerecognizeonnx_tpu.parallel.sharded_ops import (
        sharded_frames_to_features,
    )
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    size = 128
    cfg = PipelineConfig(
        det_input_size=size, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    calib = jnp.asarray(rng.uniform(-1, 1, (4, 112, 112, 3)).astype(np.float32))
    qstate = quant.quantize_recognizer(arcface.apply, arc, calib, min_channels=128)
    qrec = quant.QuantizedRecognizer(arcface.apply, arc, qstate)
    frames = rng.integers(0, 256, (3, size, size, 3)).astype(np.uint8)

    dets_s, feats_s = sharded_frames_to_features(
        det, qrec, frames, cfg, max_faces_embed=4
    )
    dets_l, feats_l = jax.jit(
        lambda v: frames_to_features(det, qrec, v, cfg, max_faces_embed=4)
    )(jnp.asarray(frames))
    # int8 rounding amplifies ulp-level batch-size differences in the
    # f32 detect stage (sharded = per-device batch 1), so elementwise
    # equality does not hold — the deployment contract is cosine.
    fs = np.asarray(feats_s).reshape(-1, 512)
    fl = np.asarray(feats_l).reshape(-1, 512)
    live = (np.linalg.norm(fs, axis=1) > 0) & (np.linalg.norm(fl, axis=1) > 0)
    assert live.any()
    cos = (fs[live] * fl[live]).sum(1) / (
        np.linalg.norm(fs[live], axis=1) * np.linalg.norm(fl[live], axis=1)
    )
    assert cos.min() > 0.999, cos.min()


def test_dp_program_runs_pallas_warp_in_shard_map(rng):
    """REGRESSION: the dp fused program must trace with the Pallas warp
    kernel inside shard_map. On real TPUs shard_map's replication
    checker (check_vma) rejected the kernel's un-annotated out_shape
    while every CPU test silently took the gather warp — caught live,
    fixed with check_rep=False in make_dp_program. warp_interpret=True
    runs the EXACT production kernel path (interpret-mode Mosaic) on the
    CPU mesh; results must match the unsharded program, fused gallery
    top-k included."""
    from facerecognizeonnx_tpu.models import arcface, scrfd
    from facerecognizeonnx_tpu.parallel.sharded_ops import make_dp_program
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_matches
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    size = 128
    cfg = PipelineConfig(
        det_input_size=size, compute_dtype="float32", pre_nms_topk=64,
        max_faces=16, score_threshold=0.3,
        warp_impl="pallas", warp_interpret=True,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    mesh = make_mesh(("data",), devices=jax.devices()[:2])
    program, _ = make_dp_program(
        det, arc, cfg, mesh=mesh, max_faces_embed=2, search_top_k=3
    )

    frames = rng.integers(0, 256, (2, size, size, 3)).astype(np.uint8)
    bank = _normed(rng, 16)
    n_rows = 12  # rows 12..15 are masked pad rows

    dets_s, feats_s, sims_s, idx_s = program(frames, bank, n_rows)
    dets_l, feats_l, sims_l, idx_l = jax.jit(
        lambda v, b: frames_to_matches(
            det, arc, v, b, jnp.int32(n_rows), cfg,
            max_faces_embed=2, top_k=3,
        )
    )(jnp.asarray(frames), jnp.asarray(bank))

    assert np.asarray(dets_l.valid).sum() > 0  # non-vacuous
    np.testing.assert_array_equal(
        np.asarray(dets_s.valid), np.asarray(dets_l.valid)
    )
    np.testing.assert_allclose(
        np.asarray(feats_s), np.asarray(feats_l), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(sims_s), np.asarray(sims_l), atol=1e-4
    )
    live = np.asarray(sims_l) > -1.0
    assert (np.asarray(idx_s)[live] < n_rows).all()
    np.testing.assert_array_equal(
        np.asarray(idx_s)[live], np.asarray(idx_l)[live]
    )
