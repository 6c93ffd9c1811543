"""Debug utilities + orbax train-state checkpoint/resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.utils.debug import nan_checks, tree_summary, validate_params


def test_validate_params_flags_nans():
    good = {"a": jnp.ones(3), "b": [jnp.zeros(2)]}
    assert validate_params(good) == []
    bad = {"a": jnp.asarray([1.0, jnp.nan]), "e": jnp.zeros(0)}
    problems = validate_params(bad)
    assert len(problems) == 2
    assert any("non-finite" in p for p in problems)
    assert any("empty" in p for p in problems)


def test_nan_checks_raises():
    with pytest.raises(FloatingPointError):
        with nan_checks():
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # config restored afterwards
    assert not jax.config.jax_debug_nans


def test_tree_summary():
    n_leaves, n_params = tree_summary({"a": jnp.ones((2, 3)), "b": jnp.ones(4)})
    assert n_leaves == 2 and n_params == 10


def test_train_state_checkpoint_roundtrip(tmp_path, rng):
    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.parallel.mesh import make_mesh
    from facerecognizeonnx_tpu.train.trainer import (
        init_train_state,
        make_train_step,
    )
    from facerecognizeonnx_tpu.utils.checkpoint import (
        load_train_state,
        save_train_state,
    )

    mesh = make_mesh(("data", "model"), (4, 2))
    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=32)
    state = init_train_state(
        jax.random.PRNGKey(0), num_classes=16, cfg=cfg, arch="iresnet18",
        mesh=mesh, lr=0.1,
    )
    step = make_train_step(mesh, cfg, lr=0.1)
    images = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, 8), jnp.int32)
    with mesh:
        state, _ = step(state, images, labels)

    path = str(tmp_path / "ckpt")
    save_train_state(path, state)

    fresh = init_train_state(
        jax.random.PRNGKey(1), num_classes=16, cfg=cfg, arch="iresnet18",
        mesh=mesh, lr=0.1,
    )
    restored = load_train_state(path, fresh)
    assert int(restored.step) == 1
    np.testing.assert_allclose(
        np.asarray(restored.classifier), np.asarray(state.classifier)
    )
    # restored classifier keeps its model-axis sharding
    assert tuple(restored.classifier.sharding.spec) == (None, "model")
    # and training continues from the restored state
    with mesh:
        restored2, loss = step(restored, images, labels)
    assert np.isfinite(float(loss))
    assert int(restored2.step) == 2
