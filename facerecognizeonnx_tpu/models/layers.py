"""Minimal functional NN layer library (params = nested dicts of arrays).

Design notes (TPU-first):
  - NHWC activations / HWIO weights — XLA TPU's native conv layout; the
    reference's CHW tensors (src/face_detector.cpp:127-136) are a CPU
    ONNX-Runtime artifact we deliberately do not copy.
  - compute dtype is configurable: params stay float32, conv/matmul
    inputs are cast (bf16 on TPU) with float32 accumulation via
    `preferred_element_type` — MXU-friendly without precision cliffs.
  - BatchNorm supports inference (running stats) and training (batch
    stats returned for the caller to fold into its state update).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5

_CONV_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------- init


def conv_init(key, kh: int, kw: int, cin: int, cout: int, groups: int = 1):
    """He-normal conv kernel, HWIO layout."""
    fan_in = kh * kw * cin // groups
    std = (2.0 / fan_in) ** 0.5
    w = jax.random.normal(key, (kh, kw, cin // groups, cout), jnp.float32) * std
    return {"w": w}


def bn_init(c: int):
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def prelu_init(c: int, alpha: float = 0.25):
    return {"alpha": jnp.full((c,), alpha, jnp.float32)}


def linear_init(key, din: int, dout: int, bias: bool = True):
    std = (2.0 / din) ** 0.5
    p = {"w": jax.random.normal(key, (din, dout), jnp.float32) * std}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


# ---------------------------------------------------------------- apply


def conv2d(
    params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """2-D conv, NHWC x HWIO, symmetric padding, f32 accumulation.

    The OUTPUT is cast back to compute_dtype: activations flow between
    layers at the compute width (bf16 on TPU), halving HBM traffic and
    VPU elementwise width vs carrying the f32 accumulator dtype around
    (accumulation itself stays f32 inside the conv).
    """
    w = params["w"].astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=_CONV_DN,
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        y = y + params["b"].astype(y.dtype)
    return y.astype(compute_dtype)


def batch_norm(
    params,
    x: jnp.ndarray,
    train: bool = False,
    eps: float = BN_EPS,
) -> Tuple[jnp.ndarray, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
    """BatchNorm over all leading axes (channel-last).

    Inference uses running stats; training normalizes with batch stats
    and returns them so the trainer can update running averages.
    Returns (y, batch_stats or None). Math in float32.
    """
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(xf.ndim - 1))
        mean = xf.mean(axes)
        var = xf.var(axes)
        stats = (mean, var)
    else:
        mean, var = params["mean"], params["var"]
        stats = None
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    y = (xf - mean) * inv + params["bias"]
    return y.astype(x.dtype), stats


def prelu(params, x: jnp.ndarray) -> jnp.ndarray:
    alpha = params["alpha"].astype(x.dtype)
    return jnp.where(x >= 0, x, x * alpha)


def linear(params, x: jnp.ndarray, compute_dtype=jnp.float32) -> jnp.ndarray:
    y = jnp.dot(
        x.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if "b" in params:
        y = y + params["b"]
    return y


def update_bn_stats(params, stats, momentum: float = 0.0):
    """Fold batch stats (collected by a model's train-mode apply) into BN
    running stats. Stat keys are '/'-joined paths into the params pytree
    (digits index lists), e.g. "layer2/0/bn3" or "head/convs/1/bn".

    momentum=0 replaces outright (single-shot calibration); momentum m
    keeps m*old + (1-m)*new (trainer EMA).
    """
    import jax as _jax

    params = _jax.tree_util.tree_map(lambda v: v, params)  # rebuild containers
    for key, (mean, var) in stats.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node[int(p)] if p.isdigit() else node[p]
        bn = dict(node[parts[-1]])
        bn["mean"] = momentum * bn["mean"] + (1 - momentum) * mean
        bn["var"] = momentum * bn["var"] + (1 - momentum) * var
        node[parts[-1]] = bn
    return params


def fold_bn_into_conv(conv, bn, eps: float = BN_EPS):
    """Exactly fold a POST-conv BatchNorm into the conv weights + bias.

    bn(conv(x)) = conv(x)*inv + (bias - mean*inv) with
    inv = scale/sqrt(var+eps) — a per-output-channel affine on the conv
    OUTPUT, so the fold is exact for any stride/padding (unlike pre-conv
    folds, which break at zero-padded borders). Weights stay float32;
    the folded conv computes identically up to fp rounding.
    """
    inv = (bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)).astype(jnp.float32)
    w = conv["w"].astype(jnp.float32) * inv  # HWIO: inv broadcasts on O
    b = conv.get("b", jnp.zeros_like(bn["mean"]))
    b = (b.astype(jnp.float32) - bn["mean"]) * inv + bn["bias"]
    return {"w": w, "b": b}


def fold_bn_into_linear(lin, bn, eps: float = BN_EPS):
    """Exactly fold a POST-linear BatchNorm (1-D) into the FC layer."""
    inv = (bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)).astype(jnp.float32)
    w = lin["w"].astype(jnp.float32) * inv  # (din, dout): inv on dout
    b = lin.get("b", jnp.zeros_like(bn["mean"]))
    b = (b.astype(jnp.float32) - bn["mean"]) * inv + bn["bias"]
    return {"w": w, "b": b}


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """v / ||v||2, guarded for the zero vector like the reference
    (src/face_recognizer.cpp:306-318: only divide when norm > 0)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    return jnp.where(norm > eps, x / jnp.maximum(norm, 1e-20), x)
