"""Tensor-parallel (channel-sharded) embed vs the single-chip oracle.

The Megatron-style schedule (parallel/tensor_parallel.py) must be a
pure execution choice: same params + crops → same features as
models/arcface.apply / embed/pipeline.embed_crops, on model-only
meshes of width 2 and 4, on a dp x tp mesh, for folded AND unfolded
param trees.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.embed.pipeline import embed_crops
from facerecognizeonnx_tpu.models import arcface
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.tensor_parallel import (
    recognizer_param_specs,
    tp_embed_crops,
)
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

CFG = PipelineConfig(compute_dtype="float32")


@pytest.fixture(scope="module")
def params():
    return init_on_host(
        lambda: arcface.init_params(jax.random.PRNGKey(5), arch="iresnet18")
    )


@pytest.fixture(scope="module")
def crops():
    rng = np.random.default_rng(13)
    return rng.integers(0, 256, (5, 112, 112, 3)).astype(np.uint8)


def _check(p, crops, mesh):
    ref = np.asarray(jax.jit(lambda pp, c: embed_crops(pp, c, CFG))(p, crops))
    got = np.asarray(tp_embed_crops(p, crops, CFG, mesh=mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_tp2_folded(params, crops):
    folded = jax.tree_util.tree_map(
        np.asarray, arcface.fold_inference_params(params)
    )
    mesh = make_mesh(("model",), (2,), devices=jax.devices()[:2])
    _check(folded, crops, mesh)


def test_tp4_unfolded(params, crops):
    mesh = make_mesh(("model",), (4,), devices=jax.devices()[:4])
    _check(params, crops, mesh)


def test_dp_x_tp(params, crops):
    # 5 crops on 2 data shards: pads to 6 internally, strips on return
    mesh = make_mesh(("data", "model"), (2, 2), devices=jax.devices()[:4])
    _check(params, crops, mesh)


def test_specs_match_param_tree(params):
    specs = recognizer_param_specs(params)
    from jax.sharding import PartitionSpec as P

    pt = jax.tree_util.tree_structure(params)
    st = jax.tree_util.tree_structure(
        jax.tree_util.tree_map(
            lambda s: 0, specs, is_leaf=lambda v: isinstance(v, P)
        )
    )
    assert pt == st


def test_weights_actually_sharded(params, crops):
    # each chip must hold 1/P of the block conv weights, not a copy
    folded = arcface.fold_inference_params(params)
    mesh = make_mesh(("model",), (2,), devices=jax.devices()[:2])
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    specs = recognizer_param_specs(folded)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda v: isinstance(v, P),
    )
    p_dev = jax.device_put(folded, shardings)
    w = p_dev["layer3"][0]["conv1"]["w"]  # (3,3,128,256) col-parallel
    local = w.addressable_shards[0].data
    assert local.shape == (3, 3, 128, 128)


def test_mbf_rejected(crops):
    with pytest.raises(ValueError, match="IResNet"):
        recognizer_param_specs({"body": {}, "fc": {}})


# ------------------------------------------------------------- ViT tp


@pytest.fixture(scope="module")
def vit_params():
    from facerecognizeonnx_tpu.models import vit

    return init_on_host(
        lambda: vit.init_params(jax.random.PRNGKey(6), arch="vit_t")
    )


def test_vit_tp2(vit_params, crops):
    mesh = make_mesh(("model",), (2,), devices=jax.devices()[:2])
    _check(vit_params, crops, mesh)


def test_vit_tp2_folded_dp_x_tp(vit_params, crops):
    from facerecognizeonnx_tpu.models import vit

    folded = jax.tree_util.tree_map(
        np.asarray, vit.fold_inference_params(vit_params)
    )
    mesh = make_mesh(("data", "model"), (2, 2), devices=jax.devices()[:4])
    _check(folded, crops, mesh)


def test_vit_heads_not_divisible_raises(vit_params, crops):
    # vit_t has 2 heads (dh=128) — a 4-wide model axis cannot shard them
    mesh = make_mesh(("model",), (4,), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="heads"):
        tp_embed_crops(vit_params, crops, CFG, mesh=mesh)


def test_vit_specs_require_packed(vit_params):
    with pytest.raises(ValueError, match="pack_tp_params"):
        recognizer_param_specs(vit_params)
