"""Training driver (train/fit.py): schedule shape, loss descent,
checkpoint/resume determinism.

The reference has no training surface (inference-only,
src/main.cpp:269-284); these tests cover the framework extension.
Runs on the 8-virtual-device CPU mesh (conftest), iresnet18 at 32px to
stay CPU-fast like tests/test_semantic_e2e.py.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.train.fit import fit, warmup_cosine
from facerecognizeonnx_tpu.train.trainer import init_train_state, make_train_step

SIZE = 32
N_IDS = 4


def test_warmup_cosine_shape():
    sched = warmup_cosine(0.1, total_steps=100, warmup_steps=10)
    assert float(sched(0)) == pytest.approx(0.001, rel=1e-3)
    assert float(sched(10)) == pytest.approx(0.1, rel=1e-3)
    # monotone warmup, then decay to the floor
    assert float(sched(5)) < float(sched(9)) < float(sched(10))
    assert float(sched(60)) < float(sched(20))
    assert float(sched(100)) == pytest.approx(0.001, rel=1e-3)


def test_warmup_cosine_defaults_clamp():
    # warmup must stay below total even for tiny runs
    sched = warmup_cosine(0.1, total_steps=5)
    values = [float(sched(i)) for i in range(6)]
    assert max(values) <= 0.1 + 1e-6  # f32 peak
    assert values[-1] < 0.02


def _identity_sample(identity: int, sample: int) -> np.ndarray:
    base_rng = np.random.default_rng(1000 + identity)
    base = base_rng.uniform(0, 255, (SIZE // 4, SIZE // 4, 3))
    base = np.kron(base, np.ones((4, 4, 1)))
    jit_rng = np.random.default_rng(identity * 97 + sample)
    noise = jit_rng.normal(0, 12, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def _batches(n_steps: int, batch: int = 16):
    """Deterministic identity batches (same sequence every call)."""
    rng = np.random.default_rng(7)
    for _ in range(n_steps):
        ids = rng.integers(0, N_IDS, batch)
        samples = rng.integers(0, 8, batch)
        imgs = np.stack([_identity_sample(i, s) for i, s in zip(ids, samples)])
        x = (imgs.astype(np.float32) - 127.5) / 128.0
        yield jnp.asarray(x), jnp.asarray(ids.astype(np.int32))


def test_fit_descends_and_checkpoints(tmp_path):
    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=SIZE)
    mesh = make_mesh(("data", "model"), (4, 2))
    total = 20
    sched = warmup_cosine(0.05, total_steps=total, warmup_steps=2)
    state = init_train_state(
        jax.random.PRNGKey(0), num_classes=N_IDS, cfg=cfg,
        arch="iresnet18", mesh=mesh, lr=sched,
    )
    step = make_train_step(mesh, cfg, lr=sched, margin=0.3)
    ckpt = str(tmp_path / "state.ckpt")
    evals = []

    def eval_fn(s):
        evals.append(int(np.asarray(s.step)))
        return {"probe": 1.0}

    with mesh:
        state, history = fit(
            state, step, _batches(total), total,
            eval_fn=eval_fn, eval_every=10,
            ckpt_path=ckpt, ckpt_every=50,  # only the final save fires
            log_every=5, log=lambda *_: None,
        )
    assert int(np.asarray(state.step)) == total
    assert os.path.exists(ckpt)
    assert [h["step"] for h in history] == [5, 10, 15, 20]
    assert history[-1]["loss_mean"] < history[0]["loss_mean"] * 0.9
    assert evals == [10, 20]
    assert any("probe" in h for h in history)


def test_fit_resume_matches_uninterrupted(tmp_path):
    cfg = PipelineConfig(compute_dtype="float32", rec_input_size=SIZE)
    mesh = make_mesh(("data", "model"), (4, 2))
    total = 8

    def fresh():
        state = init_train_state(
            jax.random.PRNGKey(0), num_classes=N_IDS, cfg=cfg,
            arch="iresnet18", mesh=mesh, lr=0.05,
        )
        return state, make_train_step(mesh, cfg, lr=0.05, margin=0.3)

    # uninterrupted run
    state_a, step_a = fresh()
    with mesh:
        state_a, _ = fit(
            state_a, step_a, _batches(total), total,
            log_every=0, log=lambda *_: None,
        )

    # interrupted at 4, resumed to 8 — same data iterator semantics
    ckpt = str(tmp_path / "resume.ckpt")
    state_b, step_b = fresh()
    with mesh:
        state_b, _ = fit(
            state_b, step_b, _batches(4), 4,
            ckpt_path=ckpt, log_every=0, log=lambda *_: None,
        )
        state_c, _ = fit(
            state_b, step_b, _batches(total), total,
            ckpt_path=ckpt, log_every=0, log=lambda *_: None,
        )
    assert int(np.asarray(state_c.step)) == total
    cls_a = np.asarray(state_a.classifier)
    cls_c = np.asarray(state_c.classifier)
    np.testing.assert_allclose(cls_a, cls_c, rtol=0, atol=1e-5)
