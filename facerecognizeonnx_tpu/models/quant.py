"""Post-training w8a8 quantization for recognizer models.

TPU v5e's MXU runs int8 matmuls/convs at 2x bf16 peak throughput, and
int8 activations halve the HBM traffic that bounds IResNet's
high-resolution stage-1 tensors — so a quantized embed is worth ~2x on
the pipeline's dominant stage. The reference has no quantization (it
runs fp32 ONNX on CPU, src/face_recognizer.cpp:270-283); this is a
deployment-grade extension, optional via
PipelineConfig.recognizer_quant="w8a8".

Scheme (standard symmetric PTQ):
  - weights: per-output-channel int8, scale = absmax/127
  - activations: per-tensor int8, scales recorded during ONE eager
    calibration forward over a representative batch; the calibration
    pass quantizes sequentially (each conv sees the error of the
    already-quantized layers, so scales match deployment conditions)
  - accumulation: int32 on the MXU; dequant + bias + BN/PReLU stay
    f32/bf16 between convs
  - depthwise/grouped convs (MobileFaceNet) stay bf16: they are
    VPU-bound, int8 buys nothing there

The DEFAULT embed path stays bf16 — the 1e-3-cosine ORT-parity contract
(SURVEY §7) applies to it, not to the quant path, which is validated by
cosine bounds instead (tests/test_quant.py).

Model-agnostic: works with any apply() that exposes conv_fn/linear_fn
hooks (models/arcface.py, models/mobilefacenet.py) — the topology is
defined once in the model; this module only swaps the matmul ops.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from facerecognizeonnx_tpu.models import layers as L

_CONV_DN = ("NHWC", "HWIO", "NHWC")


# ------------------------------------------------------------ quant ops


def _quantize_weight(w: jnp.ndarray, channel_axis: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8. Returns (w_q, scale)."""
    axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axes)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    shape = [1] * w.ndim
    shape[channel_axis] = -1
    w_q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scale.reshape(shape)), -127, 127
    ).astype(jnp.int8)
    return w_q, scale


def _quantize_act(x: jnp.ndarray, in_scale: jnp.ndarray) -> jnp.ndarray:
    inv = 1.0 / in_scale
    return jnp.clip(jnp.round(x.astype(jnp.float32) * inv), -127, 127).astype(
        jnp.int8
    )


def conv2d_q(
    qp: Dict,
    x: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """w8a8 conv: int8 operands, int32 MXU accumulation, f32 dequant.

    The quantize of x (round/clip/cast) is elementwise, so XLA fuses it
    into the producing op's epilogue — the int8 tensor written to HBM is
    HALF the bf16 traffic, not an extra pass.
    """
    assert groups == 1, "grouped convs are not quantized"
    xq = _quantize_act(x, qp["in_scale"])
    y = lax.conv_general_dilated(
        xq,
        qp["w_q"],
        (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=_CONV_DN,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (qp["w_scale"] * qp["in_scale"])
    if "b" in qp:
        y = y + qp["b"]
    return y.astype(compute_dtype)


def linear_q(qp: Dict, x: jnp.ndarray, compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    xq = _quantize_act(x, qp["in_scale"])
    y = jax.lax.dot_general(
        xq, qp["w_q"], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = y.astype(jnp.float32) * (qp["w_scale"] * qp["in_scale"])
    if "b" in qp:
        y = y + qp["b"]
    return y  # FC output stays f32 like layers.linear


# ------------------------------------------- calibrate + quantize (PTQ)


def quantize_recognizer(
    apply_fn: Callable,
    params: Dict,
    calib_x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    min_channels: int = 0,
) -> Dict:
    """One calibration forward → quantized op state (jit-compatible).

    calib_x: (B, S, S, 3) representative normalized inputs ([-1, 1]
    crops; B≥32 recommended). Returns {"convs": (...), "linears": (...)}
    — per-op dicts in TRACE ORDER (the model's apply() visits ops in a
    deterministic order, so positional matching is exact), None entries
    for ops left in bf16 (grouped convs).

    min_channels: quantize only convs with ≥ this many output channels.
    Measured on v5e (tools/exp_int8_conv.py): XLA int8 convs run 0.83x
    bf16 at 256 channels but 1.25x (SLOWER) at 64 — int8 is emulated
    near the lane width, so selective quantization (min_channels=128)
    is the profitable configuration; full w8a8 is for memory-bound
    deployments (42 MB vs 166 MB weights).
    """
    qconvs, qlins = [], []

    def conv_hook(p, x, stride=1, padding=0, groups=1, compute_dtype=compute_dtype):
        if groups != 1 or p["w"].shape[-1] < min_channels:
            qconvs.append(None)
            return L.conv2d(
                p, x, stride, padding, groups=groups, compute_dtype=compute_dtype
            )
        w_q, w_scale = _quantize_weight(p["w"], channel_axis=3)
        in_scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
        qp = {"w_q": w_q, "w_scale": w_scale, "in_scale": in_scale}
        if "b" in p:
            qp["b"] = p["b"].astype(jnp.float32)
        qconvs.append(qp)
        return conv2d_q(qp, x, stride, padding, compute_dtype=compute_dtype)

    def linear_hook(p, x, compute_dtype=compute_dtype):
        w_q, w_scale = _quantize_weight(p["w"], channel_axis=1)
        in_scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-12) / 127.0
        qp = {"w_q": w_q, "w_scale": w_scale, "in_scale": in_scale}
        if "b" in p:
            qp["b"] = p["b"].astype(jnp.float32)
        qlins.append(qp)
        return linear_q(qp, x, compute_dtype=compute_dtype)

    apply_fn(
        params,
        calib_x,
        compute_dtype=compute_dtype,
        conv_fn=conv_hook,
        linear_fn=linear_hook,
    )
    return {"convs": tuple(qconvs), "linears": tuple(qlins)}


def apply_quantized(
    apply_fn: Callable,
    params: Dict,
    qstate: Dict,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Quantized forward: same topology, int8 conv/FC ops.

    params still provides BN/PReLU (and any non-quantized conv); the
    float conv weights it carries are dead inputs XLA eliminates.
    jit-compatible — qstate is a pytree of arrays.
    """
    conv_it = iter(qstate["convs"])
    lin_it = iter(qstate["linears"])

    def conv_fn(p, x_, stride=1, padding=0, groups=1, compute_dtype=compute_dtype):
        qp = next(conv_it)
        if qp is None:
            return L.conv2d(
                p, x_, stride, padding, groups=groups, compute_dtype=compute_dtype
            )
        return conv2d_q(qp, x_, stride, padding, compute_dtype=compute_dtype)

    def linear_fn(p, x_, compute_dtype=compute_dtype):
        return linear_q(next(lin_it), x_, compute_dtype=compute_dtype)

    return apply_fn(
        params, x, compute_dtype=compute_dtype, conv_fn=conv_fn, linear_fn=linear_fn
    )


class QuantizedRecognizer:
    """Drop-in recognizer params for the embed pipelines.

    embed_crops() duck-types params with .apply (the OnnxRunner
    protocol, embed/pipeline.py:90), so a quantized model threads
    through embed/fused/API pipelines with no pipeline changes:

        q = quantize_recognizer(arcface.apply, params, calib)
        rec = QuantizedRecognizer(arcface.apply, params, q)
        feats = embed_crops(rec, crops, cfg)
    """

    def __init__(self, model_apply: Callable, params: Dict, qstate: Dict, strip: bool = True):
        self.model_apply = model_apply
        self.params = (
            strip_quantized_weights(params, qstate, model_apply) if strip else params
        )
        self.qstate = qstate

    def apply(self, x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
        return apply_quantized(
            self.model_apply, self.params, self.qstate, x, compute_dtype=dtype
        )


def strip_quantized_weights(
    params: Dict, qstate: Dict, apply_fn: Callable = None
) -> Dict:
    """Replace float weights of QUANTIZED convs/FCs with empty
    placeholders so a deployed pipeline doesn't keep two copies of the
    model in HBM (r50 full w8a8: 166 MB f32 → 42 MB int8 + BN/PReLU
    floats; selective min_channels=128 keeps only stage-1's f32 convs).

    Pytree leaf order is NOT the trace order, so which "w" leaves are
    quantized is recovered by re-tracing apply_fn under jax.eval_shape
    (zero compute) with hooks that consume qstate positionally and
    record id(w) of each quantized op. Without apply_fn, falls back to
    the all-or-nothing behavior (strip only when no op was skipped).
    """
    if apply_fn is not None:
        conv_it = iter(qstate["convs"])
        lin_it = iter(qstate["linears"])
        ids = set()

        def conv_fn(p, x, stride=1, padding=0, groups=1, compute_dtype=jnp.float32):
            if next(conv_it) is not None:
                ids.add(id(p["w"]))
            return L.conv2d(
                p, x, stride, padding, groups=groups, compute_dtype=compute_dtype
            )

        def linear_fn(p, x, compute_dtype=jnp.float32):
            next(lin_it)
            ids.add(id(p["w"]))
            return L.linear(p, x, compute_dtype=compute_dtype)

        # 112 is the family input contract (reference
        # src/face_recognizer.cpp:8-10); the trace is shape-only (no
        # compute). A model built for another size fails its FC reshape
        # here — then keep the full params (correctness never depends on
        # stripping).
        try:
            jax.eval_shape(
                lambda v: apply_fn(params, v, conv_fn=conv_fn, linear_fn=linear_fn),
                jax.ShapeDtypeStruct((1, 112, 112, 3), jnp.float32),
            )
        except Exception:
            return params

        def strip_by_id(node):
            if isinstance(node, dict):
                return {
                    k: (
                        jnp.zeros((0,), jnp.float32)
                        if k == "w" and id(v) in ids
                        else strip_by_id(v)
                    )
                    for k, v in node.items()
                }
            if isinstance(node, (list, tuple)):
                return type(node)(strip_by_id(v) for v in node)
            return node

        return strip_by_id(params)

    if any(q is None for q in qstate["convs"]):
        return params  # mixed models: keep as-is, XLA DCEs unused weights

    def strip(node):
        if isinstance(node, dict):
            if "w" in node and isinstance(node["w"], jnp.ndarray):
                out = {k: strip(v) for k, v in node.items() if k != "w"}
                out["w"] = jnp.zeros((0,), jnp.float32)
                return out
            return {k: strip(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(strip(v) for v in node)
        return node

    return strip(params)
