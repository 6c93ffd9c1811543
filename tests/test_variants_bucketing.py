"""SCRFD model-family variants + host-letterbox bucketing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import scrfd
from facerecognizeonnx_tpu.utils.hostinit import init_on_host


def test_tpu_dense_variant_parity_vs_torch(rng):
    from tests.oracles.torch_models import scrfd_forward
    from tests.test_arcface import _floor_bn_var
    from facerecognizeonnx_tpu.models.layers import update_bn_stats

    params = init_on_host(
        lambda: scrfd.init_params(jax.random.PRNGKey(2), variant="tpu")
    )
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    _, stats = scrfd.apply(params, x, train=True)
    params = _floor_bn_var(update_bn_stats(params, stats))
    got = scrfd.apply(params, x)
    ref = scrfd_forward(params, np.asarray(x))
    for stride in (8, 16, 32):
        for g, r in zip(got[stride], ref[stride]):
            np.testing.assert_allclose(np.asarray(g), r, atol=2e-3)


@pytest.mark.parametrize("variant", ["500m", "2.5g", "10g", "tpu"])
def test_variant_forward_shapes(variant):
    params = init_on_host(
        lambda: scrfd.init_params(jax.random.PRNGKey(0), variant=variant)
    )
    assert scrfd.infer_variant(params) == variant
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    outs = scrfd.apply(params, x)
    assert set(outs) == {8, 16, 32}
    for stride, (s, b, k) in outs.items():
        n = (128 // stride) ** 2 * 2
        assert s.shape == (1, n, 1) and b.shape == (1, n, 4) and k.shape == (1, n, 10)


def test_variant_param_counts_ordered():
    sizes = []
    for variant in ("500m", "2.5g", "10g"):
        p = init_on_host(
            lambda v=variant: scrfd.init_params(jax.random.PRNGKey(0), variant=v)
        )
        sizes.append(scrfd.num_params(p))
    assert sizes[0] < sizes[1] < sizes[2]


def test_host_letterbox_matches_device_path(rng):
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector
    from facerecognizeonnx_tpu.runtime.native import native_available

    if not native_available():
        pytest.skip("native runtime unavailable")

    img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    det_dev = FaceDetector(PipelineConfig(compute_dtype="float32"))
    det_dev.load_model()
    det_host = FaceDetector(
        PipelineConfig(compute_dtype="float32", host_letterbox=True)
    )
    det_host.params = det_dev.params  # same weights

    d1 = det_dev.detect_raw(img)
    d2 = det_host.detect_raw(img)
    v1, v2 = np.asarray(d1.valid), np.asarray(d2.valid)
    assert v1.sum() == v2.sum()
    # native uint8 letterbox vs device float letterbox: same survivors,
    # coords within a couple pixels
    n = v1.sum()
    np.testing.assert_allclose(
        np.asarray(d1.boxes)[:n], np.asarray(d2.boxes)[:n], atol=3.0, rtol=0.02
    )
    # single 640 program reused for a second resolution: no new cache entry
    img2 = rng.integers(0, 256, (600, 800, 3), dtype=np.uint8)
    det_host.detect_raw(img2)
    assert len(det_host._jit_cache) == 1
    det_dev.detect_raw(img2)
    assert len(det_dev._jit_cache) == 2
