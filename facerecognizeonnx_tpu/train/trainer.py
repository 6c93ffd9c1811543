"""Sharded ArcFace training step (dp × model-parallel partial-FC).

One jit-compiled SPMD program over a ("data", "model") mesh:
  - images/labels sharded over "data" (data parallelism)
  - backbone params replicated (gradients all-reduced by GSPMD)
  - classifier (D, C) sharded column-wise over "model" (tensor/partial-FC
    parallelism — the softmax normalizer becomes a psum over "model")
  - BN running stats updated with EMA batch stats inside the step

This is the multi-chip path `__graft_entry__.dryrun_multichip` compiles
on a virtual mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models.layers import l2_normalize, update_bn_stats
from facerecognizeonnx_tpu.train.arcface_loss import (
    arcface_margin_logits,
    softmax_xent,
)


class TrainState(NamedTuple):
    params: dict  # backbone (includes BN running stats)
    classifier: jnp.ndarray  # (D, C) partial-FC matrix
    opt_state: tuple
    step: jnp.ndarray


def make_optimizer(lr: float = 0.02, momentum: float = 0.9):
    return optax.sgd(lr, momentum=momentum)


def init_train_state(
    key,
    num_classes: int,
    cfg: PipelineConfig = PipelineConfig(),
    arch: str = "iresnet50",
    mesh: Optional[Mesh] = None,
    lr: float = 0.02,
) -> TrainState:
    from facerecognizeonnx_tpu.train.arcface_loss import init_classifier
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    from facerecognizeonnx_tpu.models import recognizer_module

    k1, k2 = jax.random.split(key)
    arch_mod = recognizer_module(arch)
    params = init_on_host(
        lambda: arch_mod.init_params(
            k1, arch=arch, input_size=cfg.rec_input_size,
            feature_dim=cfg.feature_dim,
        )
    )
    classifier = init_on_host(lambda: init_classifier(k2, cfg.feature_dim, num_classes))
    opt = make_optimizer(lr)
    opt_state = init_on_host(lambda: opt.init((params, classifier)))
    state = TrainState(params, classifier, opt_state, jnp.zeros((), jnp.int32))
    if mesh is not None:
        state = jax.device_put(state, train_state_shardings(mesh, state))
    return state


def train_state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """Sharding pytree: classifier split over "model", rest replicated."""
    repl = NamedSharding(mesh, P())
    cls = NamedSharding(mesh, P(None, "model"))
    return TrainState(
        params=jax.tree_util.tree_map(lambda _: repl, state.params),
        classifier=cls,
        opt_state=jax.tree_util.tree_map(
            lambda leaf: cls
            if getattr(leaf, "ndim", 0) == 2
            and leaf.shape == state.classifier.shape
            else repl,
            state.opt_state,
        ),
        step=repl,
    )


def make_train_step(
    mesh: Mesh,
    cfg: PipelineConfig = PipelineConfig(),
    margin: float = 0.5,
    scale: float = 64.0,
    lr: float = 0.02,
    bn_momentum: float = 0.9,
    compute_dtype=jnp.float32,
    remat: bool = False,
):
    """Returns step(state, images, labels) -> (state, loss).

    images: (B, S, S, 3) normalized RGB, sharded over "data";
    labels: (B,) int32 class ids. remat=True rematerializes the backbone
    forward in the backward pass (jax.checkpoint) — trades ~33% more
    FLOPs for dropping all intermediate activations from HBM, the lever
    for large per-chip batches.
    """
    opt = make_optimizer(lr)
    data_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    from facerecognizeonnx_tpu.models import recognizer_apply

    backbone_fwd = lambda params, images: recognizer_apply(  # noqa: E731
        params, images, compute_dtype=compute_dtype, train=True
    )
    if remat:
        backbone_fwd = jax.checkpoint(backbone_fwd)

    def loss_fn(params, classifier, images, labels):
        feats, stats = backbone_fwd(params, images)
        feats = l2_normalize(feats)
        logits = arcface_margin_logits(feats, classifier, labels, margin, scale)
        logits = jax.lax.with_sharding_constraint(
            logits, NamedSharding(mesh, P("data", "model"))
        )
        return softmax_xent(logits, labels), stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, labels) -> Tuple[TrainState, jnp.ndarray]:
        (loss, stats), grads = jax.value_and_grad(
            lambda p, c: loss_fn(p, c, images, labels), argnums=(0, 1), has_aux=True
        )(state.params, state.classifier)
        updates, opt_state = opt.update(
            grads, state.opt_state, (state.params, state.classifier)
        )
        new_params, new_classifier = optax.apply_updates(
            (state.params, state.classifier), updates
        )
        new_params = update_bn_stats(new_params, stats, momentum=bn_momentum)
        new_state = TrainState(
            new_params, new_classifier, opt_state, state.step + 1
        )
        return new_state, loss

    def run(state: TrainState, images, labels):
        images = jax.device_put(images, data_sharding)
        labels = jax.device_put(labels, data_sharding)
        return step(state, images, labels)

    return run
