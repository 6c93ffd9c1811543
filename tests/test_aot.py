"""AOT export/load of the fused pipeline (pipeline/aot.py)."""

import jax
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.pipeline.aot import load_fused, save_fused
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

SIZE = 128
CFG = PipelineConfig(
    det_input_size=SIZE, compute_dtype="float32", pre_nms_topk=64,
    max_faces=16,
)


@pytest.fixture(scope="module")
def params():
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
    )
    return det, arc


def test_roundtrip_matches_live_program(params, tmp_path, rng):
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    det, arc = params
    path = str(tmp_path / "fused.jaxexport")
    save_fused(path, det, arc, CFG, batch=2, max_faces_embed=4)

    fn = load_fused(path)
    frames = rng.integers(0, 256, (2, SIZE, SIZE, 3)).astype(np.uint8)
    boxes, scores, kps, valid, feats = fn(frames)

    dets_live, feats_live = jax.jit(
        lambda v: frames_to_features(det, arc, v, CFG, max_faces_embed=4)
    )(frames)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(dets_live.valid))
    np.testing.assert_allclose(
        np.asarray(feats), np.asarray(feats_live), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(boxes), np.asarray(dets_live.boxes), atol=1e-3
    )


def test_bundle_roundtrip_and_swap(params, tmp_path, rng):
    """.frtz bundle: program+weights in one file, weights as call args —
    swap_params drops in refreshed weights without re-export."""
    from facerecognizeonnx_tpu.pipeline.aot import load_bundle, save_bundle
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    det, arc = params
    path = str(tmp_path / "fused.frtz")
    save_bundle(path, det, arc, CFG, batch=2, max_faces_embed=4)

    pipe = load_bundle(path)
    assert pipe.batch == 2 and pipe.config.det_input_size == SIZE
    frames = rng.integers(0, 256, (2, SIZE, SIZE, 3)).astype(np.uint8)
    boxes, scores, kps, valid, feats = pipe(frames)

    dets_live, feats_live = jax.jit(
        lambda v: frames_to_features(det, arc, v, CFG, max_faces_embed=4)
    )(frames)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(dets_live.valid))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats_live), atol=3e-5)

    # weight swap: a different recognizer init changes features through
    # the SAME loaded program
    arc2 = init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(7), arch="iresnet18")
    )
    pipe.swap_params(arc_params=arc2)
    _b2, _s2, _k2, valid2, feats2 = pipe(frames)
    np.testing.assert_array_equal(np.asarray(valid2), np.asarray(valid))
    live2 = jax.jit(
        lambda v: frames_to_features(det, arc2, v, CFG, max_faces_embed=4)
    )(frames)[1]
    np.testing.assert_allclose(np.asarray(feats2), np.asarray(live2), atol=3e-5)


def test_bundle_rejects_wrong_shape_and_garbage(params, tmp_path, rng):
    from facerecognizeonnx_tpu.errors import InvalidInputError, ModelLoadError
    from facerecognizeonnx_tpu.pipeline.aot import load_bundle, save_bundle

    det, arc = params
    path = str(tmp_path / "fused.frtz")
    save_bundle(path, det, arc, CFG, batch=2, max_faces_embed=4)
    pipe = load_bundle(path)
    with pytest.raises(InvalidInputError):
        pipe(rng.integers(0, 256, (3, SIZE, SIZE, 3)).astype(np.uint8))

    p = tmp_path / "junk.frtz"
    p.write_bytes(b"not a zip")
    with pytest.raises(ModelLoadError):
        load_bundle(str(p))
    with pytest.raises(ModelLoadError):
        load_bundle(str(tmp_path / "missing.frtz"))


def test_bundle_cross_platform_export(params, tmp_path):
    """A CPU-only build host can export a TPU bundle — the Pallas warp
    kernel lowers to its serialized Mosaic payload at trace time, no TPU
    backend needed (deployment build-machine story). Running it on the
    wrong platform is rejected by jax.export's platform check."""
    from facerecognizeonnx_tpu.pipeline.aot import load_bundle, save_bundle

    det, arc = params
    cfg_tpu = PipelineConfig(
        det_input_size=SIZE, compute_dtype="bfloat16", pre_nms_topk=64,
        max_faces=16, warp_impl="pallas",
    )
    path = str(tmp_path / "tpu_only.frtz")
    save_bundle(path, det, arc, cfg_tpu, batch=1, max_faces_embed=4,
                platforms=["tpu"])
    pipe = load_bundle(path)
    assert pipe.meta["platforms"] == ["tpu"]
    with pytest.raises(Exception, match="(?i)platform|tpu"):
        pipe(np.zeros((1, SIZE, SIZE, 3), np.uint8))


def test_load_rejects_garbage(tmp_path):
    from facerecognizeonnx_tpu.errors import ModelLoadError

    p = tmp_path / "junk.jaxexport"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ModelLoadError):
        load_fused(str(p))
    with pytest.raises(ModelLoadError):
        load_fused(str(tmp_path / "missing.jaxexport"))
