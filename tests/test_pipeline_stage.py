"""Stage-pipelined (pp) inference vs the fused single-program oracle.

The pipeline schedule (parallel/pipeline_stage.py) must be a pure
execution-schedule choice: for the same params and frames it returns
exactly what pipeline/fused.frames_to_features returns, on a
("stage",)-only mesh, on a dp x pp ("data", "stage") mesh, and with
more microbatches than the minimum.
"""

import jax
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.pipeline_stage import (
    pipelined_frames_to_features,
)
from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

CFG = PipelineConfig(
    det_input_size=128,
    compute_dtype="float32",
    pre_nms_topk=64,
    max_faces=16,
)


@pytest.fixture(scope="module")
def params():
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(2)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(3), arch="iresnet18")
    )
    return det, arc


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (4, 128, 128, 3)).astype(np.uint8)


def _oracle(params, frames):
    det, arc = params
    dets, feats = jax.jit(
        lambda d, a, f: frames_to_features(d, a, f, CFG, max_faces_embed=4)
    )(det, arc, frames)
    return jax.tree_util.tree_map(np.asarray, (dets, feats))


def _check(params, frames, mesh, n_micro, b=None):
    det, arc = params
    f = frames if b is None else frames[:b]
    ref_dets, ref_feats = _oracle(params, f)
    dets, feats = pipelined_frames_to_features(
        det, arc, f, CFG, mesh=mesh, max_faces_embed=4, n_micro=n_micro
    )
    np.testing.assert_array_equal(np.asarray(dets.valid), ref_dets.valid)
    np.testing.assert_allclose(
        np.asarray(dets.boxes), ref_dets.boxes, rtol=1e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dets.scores), ref_dets.scores, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feats), ref_feats, rtol=1e-4, atol=1e-5
    )


def test_stage_only_mesh(params, frames):
    mesh = make_mesh(("stage",), (2,), devices=jax.devices()[:2])
    _check(params, frames, mesh, n_micro=2)


def test_dp_x_pp_mesh(params, frames):
    mesh = make_mesh(("data", "stage"), (2, 2), devices=jax.devices()[:4])
    _check(params, frames, mesh, n_micro=2)


def test_more_microbatches_and_padding(params, frames):
    # B=3 on a 2-pipeline with 4 microbatches: pads 3 -> 8 internally,
    # strips the padding rows on return
    mesh = make_mesh(("stage",), (2,), devices=jax.devices()[:2])
    _check(params, frames, mesh, n_micro=4, b=3)


def test_dp_x_pp_x_tp_mesh(params, frames):
    """The full 3-axis composition on one 2x2x2 mesh: frames shard over
    "data", each data replica runs the 2-stage pipeline over "stage",
    and the embed stage is Megatron channel-sharded over "model" —
    must still reproduce the fused single-program result exactly."""
    mesh = make_mesh(
        ("data", "stage", "model"), (2, 2, 2), devices=jax.devices()[:8]
    )
    _check(params, frames, mesh, n_micro=2)


def test_tp_rejects_quantized_recognizer(params, frames):
    from facerecognizeonnx_tpu.models import quant

    det, arc = params
    calib = np.random.default_rng(0).uniform(
        -1, 1, (2, 112, 112, 3)
    ).astype(np.float32)
    qstate = jax.jit(
        lambda p, c: quant.quantize_recognizer(
            arcface.apply, p, c, min_channels=128
        )
    )(arc, calib)
    qrec = quant.QuantizedRecognizer(arcface.apply, arc, qstate)
    mesh = make_mesh(
        ("stage", "model"), (2, 2), devices=jax.devices()[:4]
    )
    with pytest.raises(ValueError, match="plain native param"):
        pipelined_frames_to_features(det, qrec, frames, CFG, mesh=mesh)


def test_vit_heads_not_divisible_raises_in_pipeline(params, frames):
    """The dp x pp x tp entry point must fail with the same clear
    ValueError tp_embed_crops gives when a ViT's heads don't divide the
    model axis — not an opaque reshape error deep inside shard_map."""
    from facerecognizeonnx_tpu.models import vit

    det, _ = params
    vit_p = init_on_host(
        lambda: vit.init_params(jax.random.PRNGKey(4), arch="vit_t")
    )
    mesh = make_mesh(("stage", "model"), (2, 4), devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="heads"):  # vit_t has 2 heads
        pipelined_frames_to_features(det, vit_p, frames, CFG, mesh=mesh)


def test_bad_stage_axis_size_raises(params, frames):
    mesh = make_mesh(("stage",), (4,), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="stage"):
        pipelined_frames_to_features(
            params[0], params[1], frames, CFG, mesh=mesh
        )


def test_valid_cap_forces_occupancy(params, frames):
    """frames_to_features(valid_cap=n) — the bench control for measuring
    the production skip_invalid_faces path at known occupancy (VERDICT
    r3 item 4) — must zero exactly the slots past n and leave the
    returned Detections untouched."""
    det, arc = params
    ref_dets, ref_feats = _oracle(params, frames)
    dets, feats = jax.jit(
        lambda d, a, f: frames_to_features(
            d, a, f, CFG, max_faces_embed=4, valid_cap=2
        )
    )(det, arc, frames)
    dets, feats = jax.tree_util.tree_map(np.asarray, (dets, feats))
    np.testing.assert_array_equal(dets.valid, ref_dets.valid)
    np.testing.assert_array_equal(dets.boxes, ref_dets.boxes)
    assert feats.shape == ref_feats.shape
    # slots >= cap are zeroed; slots < cap are embedded (nonzero)
    assert (feats[:, 2:] == 0).all()
    assert (np.abs(feats[:, :2]).sum(axis=-1) > 0).all()
    # capped slots that were ALSO valid in the reference carry the same
    # features (forcing validity must not change the embed math)
    both = np.asarray(ref_dets.valid)[:, :2].astype(bool)
    np.testing.assert_allclose(
        feats[:, :2][both], ref_feats[:, :2][both], rtol=1e-5, atol=1e-6
    )
