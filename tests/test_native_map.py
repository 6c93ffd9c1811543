"""ONNX → native-params mapping round-trip (real-weights fast path)."""

import jax
import numpy as np
import pytest

from facerecognizeonnx_tpu.models import arcface
from facerecognizeonnx_tpu.onnx_import import proto
from facerecognizeonnx_tpu.onnx_import.native_map import map_arcface
from facerecognizeonnx_tpu.utils.hostinit import init_on_host
from tests.oracles.iresnet_onnx import emit_iresnet_onnx


@pytest.fixture(scope="module")
def r18_small():
    return init_on_host(
        lambda: arcface.init_params(
            jax.random.PRNGKey(3), arch="iresnet18", input_size=32
        )
    )


def test_roundtrip_recovers_params(r18_small, tmp_path):
    data = emit_iresnet_onnx(r18_small, "iresnet18", 32)
    path = str(tmp_path / "r18.onnx")
    open(path, "wb").write(data)
    mapped = map_arcface(path, arch="iresnet18", input_size=32)
    assert mapped is not None
    flat_a = jax.tree_util.tree_leaves_with_path(r18_small)
    flat_b = jax.tree_util.tree_leaves_with_path(mapped)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=1e-6, err_msg=str(pa)
        )


def test_mapped_forward_matches_original(r18_small, rng):
    graph = proto.parse_model(emit_iresnet_onnx(r18_small, "iresnet18", 32))
    mapped = map_arcface(graph, arch="iresnet18", input_size=32)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    a = np.asarray(arcface.apply(r18_small, x))
    b = np.asarray(arcface.apply(mapped, x))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_wrong_arch_rejected(r18_small):
    graph = proto.parse_model(emit_iresnet_onnx(r18_small, "iresnet18", 32))
    assert map_arcface(graph, arch="iresnet50", input_size=32) is None


def test_node_order_mismatch_rejected(r18_small):
    """A graph whose conv NODE ORDER differs from the assumed forward
    order (same shapes at the swapped sites) must never yield a silently
    wrong mapping — the self-verification gate rejects it."""
    graph = proto.parse_model(emit_iresnet_onnx(r18_small, "iresnet18", 32))
    conv_idx = [
        i for i, n in enumerate(graph.nodes)
        if n.op_type == "Conv"
        and graph.initializers[n.inputs[1]].shape == (64, 64, 3, 3)
    ]
    assert len(conv_idx) >= 2
    i, j = conv_idx[0], conv_idx[1]
    graph.nodes[i], graph.nodes[j] = graph.nodes[j], graph.nodes[i]
    assert map_arcface(graph, arch="iresnet18", input_size=32) is None


# ---------------------------------------------------------- MobileFaceNet


@pytest.fixture(scope="module")
def mbf_small():
    from facerecognizeonnx_tpu.models import mobilefacenet as mbf

    return init_on_host(
        lambda: mbf.init_params(jax.random.PRNGKey(4), input_size=64)
    )


def test_mbf_roundtrip_recovers_params(mbf_small, tmp_path):
    from facerecognizeonnx_tpu.onnx_import.native_map import map_mobilefacenet
    from tests.oracles.mbf_onnx import emit_mobilefacenet_onnx

    data = emit_mobilefacenet_onnx(mbf_small, input_size=64)
    path = str(tmp_path / "mbf.onnx")
    open(path, "wb").write(data)
    mapped = map_mobilefacenet(path, input_size=64)
    assert mapped is not None
    flat_a = jax.tree_util.tree_leaves_with_path(mbf_small)
    flat_b = jax.tree_util.tree_leaves_with_path(mapped)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(
            np.asarray(va), np.asarray(vb), atol=1e-6, err_msg=str(pa)
        )


def test_map_recognizer_routes_by_family(mbf_small, r18_small):
    """map_recognizer finds the right family even when the arch hint is
    wrong (both mappers self-verify; a wrong guess costs one walk)."""
    from facerecognizeonnx_tpu.onnx_import.native_map import map_recognizer
    from tests.oracles.mbf_onnx import emit_mobilefacenet_onnx
    from facerecognizeonnx_tpu.models import mobilefacenet as mbf

    graph_mbf = proto.parse_model(emit_mobilefacenet_onnx(mbf_small, 64))
    graph_r18 = proto.parse_model(emit_iresnet_onnx(r18_small, "iresnet18", 32))
    # write-through to files (map_recognizer takes paths or graphs alike
    # because the underlying mappers do)
    got = map_recognizer(graph_mbf, arch="mbf", input_size=64)
    assert got is not None and "body" in got
    got = map_recognizer(graph_r18, arch="iresnet18", input_size=32)
    assert got is not None and "layer1" in got
    # wrong-family hint still resolves via the fallback walk
    got = map_recognizer(graph_mbf, arch="iresnet18", input_size=64)
    assert got is not None and "body" in got


def test_map_vit_roundtrip(tmp_path):
    """Exported ViT .onnx maps back onto native models/vit.py params
    (structural walk + numeric self-verify) — the fast TPU load path
    for vit weight files."""
    import jax
    import numpy as np

    from facerecognizeonnx_tpu import onnx_export
    from facerecognizeonnx_tpu.models import vit
    from facerecognizeonnx_tpu.onnx_import.native_map import (
        map_recognizer,
        map_vit,
    )

    params = vit.init_params(jax.random.PRNGKey(21), arch="vit_t")
    path = str(tmp_path / "w600k_vit_t.onnx")
    onnx_export.export_recognizer(params, path)

    mapped = map_vit(path)
    assert mapped is not None
    x = np.random.default_rng(2).uniform(-1, 1, (2, 112, 112, 3)).astype(
        np.float32
    )
    want = np.asarray(vit.apply(params, x))
    got = np.asarray(vit.apply(mapped, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # arch-directed dispatch finds it too
    assert map_recognizer(path, "vit_t") is not None
    # and a conv graph is NOT claimed by the vit mapper
    from facerecognizeonnx_tpu.models import mobilefacenet

    mp = mobilefacenet.init_params(jax.random.PRNGKey(22), arch="mbf")
    path2 = str(tmp_path / "w600k_mbf.onnx")
    onnx_export.export_recognizer(mp, path2)
    assert map_vit(path2) is None
