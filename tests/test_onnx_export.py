"""onnx_export public API: export → re-import round trips.

The emitters themselves are exercised in depth by the importer suites
(tests/test_native_map.py, tests/test_real_onnx_parity.py import THE
SAME graphs via the oracle shims); here the public surface is pinned:
dispatch, file writing, folded-params rejection, and a full
export→import→cosine loop through the OTHER side of the codebase.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu import onnx_export
from facerecognizeonnx_tpu.models import arcface, mobilefacenet


def _x(n=2, key=0):
    rng = np.random.default_rng(key)
    return jnp.asarray(
        (rng.integers(0, 256, (n, 112, 112, 3)).astype(np.float32) - 127.5) / 128.0
    )


def test_export_iresnet_roundtrip(tmp_path):
    params = arcface.init_params(jax.random.PRNGKey(0), arch="iresnet18")
    path = str(tmp_path / "w600k_r18.onnx")
    data = onnx_export.export_recognizer(params, path)
    assert open(path, "rb").read() == data and len(data) > 1_000_000

    # back through the importer's native mapper (numerically self-verified)
    from facerecognizeonnx_tpu.onnx_import.native_map import map_recognizer

    mapped = map_recognizer(path, "iresnet18")
    assert mapped is not None
    x = _x()
    want = arcface.apply(params, x)
    got = arcface.apply(mapped, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_export_mbf_roundtrip_executor(tmp_path):
    params = mobilefacenet.init_params(jax.random.PRNGKey(1), arch="mbf")
    path = str(tmp_path / "w600k_mbf.onnx")
    onnx_export.export_recognizer(params, path)

    # back through the GENERIC graph executor (no native mapping)
    from facerecognizeonnx_tpu.onnx_import.importer import load_onnx_params

    runner = load_onnx_params(path)
    x = _x(key=2)
    want = np.asarray(mobilefacenet.apply(params, x))
    got = np.asarray(runner.apply(x, jnp.float32))
    cos = (want * got).sum(1) / (
        np.linalg.norm(want, axis=1) * np.linalg.norm(got, axis=1)
    )
    assert cos.min() > 1.0 - 1e-5, cos


def test_export_rejects_folded_params():
    params = arcface.fold_inference_params(
        arcface.init_params(jax.random.PRNGKey(2), arch="iresnet18")
    )
    with pytest.raises(ValueError, match="UNFOLDED"):
        onnx_export.export_recognizer(params)


def test_export_rejects_wrappers():
    class FakeRunner:
        def apply(self, x, d):  # pragma: no cover
            return x

    with pytest.raises(ValueError, match="native unfolded pytree"):
        onnx_export.export_recognizer(FakeRunner())


def test_export_scrfd_roundtrip_bit_exact(tmp_path):
    """Exported detector graph reproduces the native forward EXACTLY
    through the importer's OnnxRunner (same f32 ops, same order)."""
    from facerecognizeonnx_tpu.models import scrfd
    from facerecognizeonnx_tpu.onnx_import.importer import OnnxRunner

    params = scrfd.init_params(jax.random.PRNGKey(4))
    path = str(tmp_path / "det_500m_exported.onnx")
    onnx_export.export_detector(params, path, input_size=192)

    runner = OnnxRunner(path)
    assert runner.kind == "scrfd" and runner.input_size == 192
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 192, 192, 3)).astype(np.float32))
    got = runner.apply(x)
    want = scrfd.apply(params, x)
    assert set(got) == {8, 16, 32}
    for s in (8, 16, 32):
        for g_, w_ in zip(got[s], want[s]):
            np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_))


def test_export_detector_s2d_variant(tmp_path):
    """The space-to-depth stem exports as an ONNX SpaceToDepth node —
    its (block_y, block_x, channel) output order matches the native
    transform, so the round trip is bit-exact with no weight permute."""
    from facerecognizeonnx_tpu.models import scrfd
    from facerecognizeonnx_tpu.onnx_import.importer import OnnxRunner

    params = scrfd.init_params(jax.random.PRNGKey(5), variant="500m_s2d")
    path = str(tmp_path / "det_s2d.onnx")
    onnx_export.export_detector(params, path, input_size=192)
    runner = OnnxRunner(path)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((1, 192, 192, 3)).astype(np.float32))
    got, want = runner.apply(x), scrfd.apply(params, x)
    for s in (8, 16, 32):
        for g_, w_ in zip(got[s], want[s]):
            np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_))


def test_export_detector_rejects_folded():
    from facerecognizeonnx_tpu.models import scrfd

    folded = scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(6)))
    with pytest.raises(ValueError, match="UNFOLDED"):
        onnx_export.export_detector(folded)


def test_export_vit_roundtrip_executor(tmp_path):
    """ViT exports to a decomposed-LN opset-9 graph (Conv patchify,
    Split heads, Erf GELU) that reproduces the native forward through
    the generic graph executor."""
    from facerecognizeonnx_tpu.models import vit
    from facerecognizeonnx_tpu.onnx_import.importer import load_onnx_params

    params = vit.init_params(jax.random.PRNGKey(11), arch="vit_t")
    path = str(tmp_path / "w600k_vit_t.onnx")
    onnx_export.export_recognizer(params, path)

    runner = load_onnx_params(path)
    assert runner.kind == "arcface" and runner.input_size == 112
    x = _x(key=12)  # (B, 112, 112, 3) NHWC batch > 1
    want = np.asarray(vit.apply(params, x))
    got = np.asarray(runner.apply(x, jnp.float32))
    assert got.shape == want.shape
    cos = (want * got).sum(1) / (
        np.linalg.norm(want, axis=1) * np.linalg.norm(got, axis=1)
    )
    assert cos.min() > 1.0 - 1e-5, cos


def test_export_vit_rejects_folded():
    from facerecognizeonnx_tpu.models import vit

    folded = vit.fold_inference_params(
        vit.init_params(jax.random.PRNGKey(13), arch="vit_t")
    )
    with pytest.raises(ValueError, match="UNFOLDED"):
        onnx_export.export_recognizer(folded)
