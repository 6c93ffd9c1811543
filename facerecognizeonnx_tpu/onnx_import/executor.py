"""ONNX graph → JAX executor (jit-compatible).

Compiles the reference's model format to XLA: each graph run is a pure
function of its inputs, so wrapping `run` in jax.jit produces ONE fused
TPU program for the whole network — the role ONNX Runtime's CPU EP plays
in the reference (src/face_detector.cpp:179-183), minus the per-node
interpreter overhead.

Conventions: ONNX activations are NCHW / weights OIHW; the default
executor keeps that layout (XLA re-layouts for TPU under jit). Shape-math
subgraphs (Shape→Gather→Unsqueeze→Concat→Reshape chains from torch
exports) are constant-folded in numpy so they never become traced ops.

NHWC fast path (`Executor(graph, nhwc=True)`): the TPU-native layout
mode for graphs the native mappers can't claim (e.g. det_500m's NAS
backbone — native_map.py only maps recognizer topologies). Activations
through conv-dense segments flow NHWC with HWIO weights — the layout
XLA:TPU wants, so no re-layout copies — tagged with a `_NHWC` wrapper;
any layout-SENSITIVE op (Reshape/Transpose/Shape/Gemm/...) transparently
untags its inputs back to NCHW first, so arbitrary graphs stay correct:
for SCRFD exports the only untag points are the 9 tiny head tensors.
`compute_dtype=bf16` additionally runs conv math at bf16 with f32
accumulation, matching the native models' activation flow.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.onnx_import import proto


def _is_static(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float)) for v in vals)


def _np(v):
    return np.asarray(v)


def _attr(node, name, default=None):
    return node.attrs.get(name, default)


def _pads4(node):
    pads = _attr(node, "pads", [0, 0, 0, 0])
    # ONNX 2D pads: [top, left, bottom, right]
    t, l, b, r = (int(p) for p in pads)
    return (t, b), (l, r)


class _NHWC:
    """Layout tag: a 4D activation currently stored NHWC (logical NCHW)."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = a


def _untag(v):
    if isinstance(v, _NHWC):
        return jnp.transpose(v.a, (0, 3, 1, 2))
    return v


class Executor:
    """Evaluates a parsed Graph. Op registry covers the convnet subset
    used by SCRFD/ArcFace exports plus common glue ops."""

    def __init__(self, graph: proto.Graph, nhwc: bool = False,
                 compute_dtype=None):
        self.graph = graph
        self.nhwc = nhwc
        self.compute_dtype = compute_dtype
        self.init = {k: v for k, v in graph.initializers.items()}
        init_names = set(self.init)
        self.input_names = [
            name for name, _ in graph.inputs if name not in init_names
        ]

    # ------------------------------------------------------------------ run

    def run(self, inputs: Dict[str, Any], nhwc_inputs: bool = False) -> List[Any]:
        """nhwc_inputs: 4D runtime inputs are ALREADY NHWC (skips the
        NHWC→NCHW→NHWC round trip when the caller holds NHWC frames);
        only meaningful with nhwc=True."""
        values: Dict[str, Any] = dict(self.init)
        for k, v in inputs.items():
            if self.nhwc and nhwc_inputs and jnp.ndim(v) == 4:
                values[k] = _NHWC(v)
            else:
                values[k] = v
        for node in self.graph.nodes:
            out = None
            if self.nhwc:
                handler = getattr(self, f"nhwc_{node.op_type.lower()}", None)
                if handler is not None:
                    args = [values[i] if i else None for i in node.inputs]
                    out = handler(node, args)
            if out is None:
                fn = getattr(self, f"op_{node.op_type.lower()}", None)
                if fn is None:
                    from facerecognizeonnx_tpu.errors import UnsupportedOnnxOp

                    raise UnsupportedOnnxOp(
                        f"ONNX op {node.op_type!r} (node {node.name!r}) not supported"
                    )
                args = [
                    _untag(values[i]) if i else None for i in node.inputs
                ]
                out = fn(node, args)
            if not isinstance(out, (tuple, list)):
                out = (out,)
            for name, val in zip(node.outputs, out):
                if name:
                    values[name] = val
        return [_untag(values[o]) for o in self.graph.outputs]

    # ------------------------------------------------------------- conv etc

    def op_conv(self, node, args):
        x, w = args[0], args[1]
        b = args[2] if len(args) > 2 else None
        strides = [int(s) for s in _attr(node, "strides", [1, 1])]
        dilations = [int(d) for d in _attr(node, "dilations", [1, 1])]
        group = int(_attr(node, "group", 1))
        (pt, pb), (pl, pr) = _pads4(node)
        auto_pad = _attr(node, "auto_pad")
        if auto_pad and auto_pad not in (b"NOTSET", "NOTSET"):
            kh, kw = w.shape[2], w.shape[3]
            if auto_pad in (b"SAME_UPPER", b"SAME_LOWER"):
                ph, pw_ = (kh - 1) * dilations[0], (kw - 1) * dilations[1]
                if auto_pad == b"SAME_UPPER":
                    pt, pb = ph // 2, ph - ph // 2
                    pl, pr = pw_ // 2, pw_ - pw_ // 2
                else:
                    pb, pt = ph // 2, ph - ph // 2
                    pr, pl = pw_ // 2, pw_ - pw_ // 2
        y = jax.lax.conv_general_dilated(
            jnp.asarray(x),
            jnp.asarray(w),
            window_strides=strides,
            padding=[(pt, pb), (pl, pr)],
            rhs_dilation=dilations,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=group,
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            y = y + jnp.asarray(b).reshape(1, -1, 1, 1)
        return y

    def op_batchnormalization(self, node, args):
        x, scale, bias, mean, var = (jnp.asarray(a) for a in args[:5])
        eps = float(_attr(node, "epsilon", 1e-5))
        shape = (1, -1) + (1,) * (jnp.ndim(x) - 2)
        inv = jax.lax.rsqrt(var + eps) * scale
        return x * inv.reshape(shape) + (bias - mean * inv).reshape(shape)

    def op_prelu(self, node, args):
        x, slope = jnp.asarray(args[0]), jnp.asarray(args[1])
        if slope.ndim == 1 and x.ndim == 4:
            slope = slope.reshape(1, -1, 1, 1)
        elif slope.ndim == 3 and x.ndim == 4:
            slope = slope[None]
        return jnp.where(x >= 0, x, x * slope)

    def op_relu(self, node, args):
        return jnp.maximum(jnp.asarray(args[0]), 0)

    def op_leakyrelu(self, node, args):
        alpha = float(_attr(node, "alpha", 0.01))
        x = jnp.asarray(args[0])
        return jnp.where(x >= 0, x, x * alpha)

    def op_sigmoid(self, node, args):
        return jax.nn.sigmoid(jnp.asarray(args[0]))

    def op_softmax(self, node, args):
        axis = int(_attr(node, "axis", -1))
        return jax.nn.softmax(jnp.asarray(args[0]), axis=axis)

    def op_clip(self, node, args):
        x = jnp.asarray(args[0])
        lo = args[1] if len(args) > 1 and args[1] is not None else _attr(node, "min")
        hi = args[2] if len(args) > 2 and args[2] is not None else _attr(node, "max")
        if lo is not None:
            x = jnp.maximum(x, jnp.asarray(lo))
        if hi is not None:
            x = jnp.minimum(x, jnp.asarray(hi))
        return x

    # --------------------------------------------------------------- pooling

    def op_maxpool(self, node, args):
        x = jnp.asarray(args[0])
        kh, kw = (int(k) for k in _attr(node, "kernel_shape"))
        sh, sw = (int(s) for s in _attr(node, "strides", [1, 1]))
        (pt, pb), (pl, pr) = _pads4(node)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            window_dimensions=(1, 1, kh, kw),
            window_strides=(1, 1, sh, sw),
            padding=((0, 0), (0, 0), (pt, pb), (pl, pr)),
        )

    def op_averagepool(self, node, args):
        x = jnp.asarray(args[0])
        kh, kw = (int(k) for k in _attr(node, "kernel_shape"))
        sh, sw = (int(s) for s in _attr(node, "strides", [1, 1]))
        (pt, pb), (pl, pr) = _pads4(node)
        summed = jax.lax.reduce_window(
            x, 0.0, jax.lax.add,
            window_dimensions=(1, 1, kh, kw),
            window_strides=(1, 1, sh, sw),
            padding=((0, 0), (0, 0), (pt, pb), (pl, pr)),
        )
        return summed / (kh * kw)

    def op_globalaveragepool(self, node, args):
        return jnp.mean(jnp.asarray(args[0]), axis=(2, 3), keepdims=True)

    # ---------------------------------------------------------------- linear

    def op_gemm(self, node, args):
        a, b = jnp.asarray(args[0]), jnp.asarray(args[1])
        c = args[2] if len(args) > 2 else None
        alpha = float(_attr(node, "alpha", 1.0))
        beta = float(_attr(node, "beta", 1.0))
        if int(_attr(node, "transA", 0)):
            a = a.T
        if int(_attr(node, "transB", 0)):
            b = b.T
        y = alpha * jnp.dot(a, b, preferred_element_type=jnp.float32)
        if c is not None:
            y = y + beta * jnp.asarray(c)
        return y

    def op_matmul(self, node, args):
        return jnp.matmul(
            jnp.asarray(args[0]), jnp.asarray(args[1]),
            preferred_element_type=jnp.float32,
        )

    # ------------------------------------------------------------ elementwise

    def _binop(self, args, np_fn, jnp_fn):
        a, b = args
        if _is_static(a, b):
            return np_fn(_np(a), _np(b))
        return jnp_fn(jnp.asarray(a), jnp.asarray(b))

    def op_add(self, node, args):
        return self._binop(args, np.add, jnp.add)

    def op_sub(self, node, args):
        return self._binop(args, np.subtract, jnp.subtract)

    def op_mul(self, node, args):
        return self._binop(args, np.multiply, jnp.multiply)

    def op_div(self, node, args):
        # ONNX Div is integer division on integer tensors (shape math in
        # torch-export glue chains: Shape→Gather→Div→Concat→Reshape).
        a, b = args
        if _is_static(a, b):
            an, bn = _np(a), _np(b)
            if np.issubdtype(an.dtype, np.integer) and np.issubdtype(
                bn.dtype, np.integer
            ):
                return an // bn
            return np.divide(an, bn)
        return jnp.divide(jnp.asarray(a), jnp.asarray(b))

    def op_pow(self, node, args):
        return self._binop(args, np.power, jnp.power)

    def op_sqrt(self, node, args):
        return jnp.sqrt(jnp.asarray(args[0]))

    def op_exp(self, node, args):
        return jnp.exp(jnp.asarray(args[0]))

    def op_erf(self, node, args):
        # opset-9 Erf (exported ViT graphs' exact GELU, onnx_export/emit.py)
        return jax.scipy.special.erf(jnp.asarray(args[0], jnp.float32))

    def op_neg(self, node, args):
        return -jnp.asarray(args[0])

    def op_reducemean(self, node, args):
        axes = _attr(node, "axes")
        keep = bool(int(_attr(node, "keepdims", 1)))
        axes = tuple(int(a) for a in axes) if axes else None
        return jnp.mean(jnp.asarray(args[0]), axis=axes, keepdims=keep)

    def op_reducesum(self, node, args):
        axes = _attr(node, "axes")
        keep = bool(int(_attr(node, "keepdims", 1)))
        axes = tuple(int(a) for a in axes) if axes else None
        return jnp.sum(jnp.asarray(args[0]), axis=axes, keepdims=keep)

    # ------------------------------------------------------- shape plumbing

    def op_shape(self, node, args):
        return np.asarray(jnp.shape(args[0]), np.int64)

    def op_gather(self, node, args):
        data, idx = args
        axis = int(_attr(node, "axis", 0))
        if _is_static(data, idx):
            return np.take(_np(data), _np(idx).astype(np.int64), axis=axis)
        return jnp.take(jnp.asarray(data), jnp.asarray(idx), axis=axis)

    def op_unsqueeze(self, node, args):
        axes = _attr(node, "axes")
        if axes is None:  # opset 13: axes is input[1]
            axes = _np(args[1]).tolist()
        x = args[0]
        if _is_static(x):
            x = _np(x)
            for a in sorted(int(v) for v in axes):
                x = np.expand_dims(x, a)
            return x
        x = jnp.asarray(x)
        for a in sorted(int(v) for v in axes):
            x = jnp.expand_dims(x, a)
        return x

    def op_squeeze(self, node, args):
        axes = _attr(node, "axes")
        if axes is None and len(args) > 1 and args[1] is not None:
            axes = _np(args[1]).tolist()
        ax = tuple(int(a) for a in axes) if axes else None
        if _is_static(args[0]):  # keep shape-math subgraphs in numpy
            return np.squeeze(_np(args[0]), axis=ax)
        return jnp.squeeze(jnp.asarray(args[0]), axis=ax)

    def op_concat(self, node, args):
        axis = int(_attr(node, "axis", 0))
        if _is_static(*args):
            return np.concatenate([_np(a) for a in args], axis=axis)
        return jnp.concatenate([jnp.asarray(a) for a in args], axis=axis)

    def op_reshape(self, node, args):
        x = jnp.asarray(args[0])
        shape = [int(s) for s in _np(args[1]).tolist()]
        # ONNX: 0 copies the input dim, -1 infers
        shape = [
            x.shape[i] if s == 0 else s for i, s in enumerate(shape)
        ]
        return x.reshape(shape)

    def op_flatten(self, node, args):
        axis = int(_attr(node, "axis", 1))
        x = jnp.asarray(args[0])
        lead = int(np.prod(x.shape[:axis])) if axis else 1
        return x.reshape(lead, -1)

    def op_transpose(self, node, args):
        perm = _attr(node, "perm")
        return jnp.transpose(jnp.asarray(args[0]), perm)

    def op_slice(self, node, args):
        x = args[0]
        if len(args) > 1 and args[1] is not None:  # opset ≥10: inputs
            starts = _np(args[1]).tolist()
            ends = _np(args[2]).tolist()
            axes = (
                _np(args[3]).tolist()
                if len(args) > 3 and args[3] is not None
                else list(range(len(starts)))
            )
            steps = (
                _np(args[4]).tolist()
                if len(args) > 4 and args[4] is not None
                else [1] * len(starts)
            )
        else:  # opset 1: attributes
            starts = _attr(node, "starts")
            ends = _attr(node, "ends")
            axes = _attr(node, "axes", list(range(len(starts))))
            steps = [1] * len(starts)
        xa = jnp.asarray(x) if not _is_static(x) else _np(x)
        slicer = [slice(None)] * xa.ndim
        for s, e, a, st in zip(starts, ends, axes, steps):
            slicer[int(a)] = slice(int(s), int(e), int(st))
        return xa[tuple(slicer)]

    def op_split(self, node, args):
        axis = int(_attr(node, "axis", 0))
        splits = _attr(node, "split")
        if splits is None and len(args) > 1 and args[1] is not None:
            splits = _np(args[1]).tolist()
        x = jnp.asarray(args[0])
        if splits is None:
            n = len(node.outputs)
            return tuple(jnp.split(x, n, axis=axis))
        idx = np.cumsum([int(s) for s in splits])[:-1]
        return tuple(jnp.split(x, idx.tolist(), axis=axis))

    def op_cast(self, node, args):
        to = int(_attr(node, "to"))
        np_dtype = proto.DTYPE_MAP[to]
        x = args[0]
        if _is_static(x):
            return _np(x).astype(np_dtype)
        return jnp.asarray(x).astype(np_dtype)

    def op_constant(self, node, args):
        val = _attr(node, "value")
        if val is None:
            for k in ("value_float", "value_int"):
                if k in node.attrs:
                    return np.asarray(node.attrs[k])
            raise NotImplementedError("Constant without value attr")
        return val

    def op_constantofshape(self, node, args):
        shape = [int(s) for s in _np(args[0]).tolist()]
        val = _attr(node, "value")
        fill = val.ravel()[0] if val is not None else np.float32(0)
        return np.full(shape, fill)

    def op_identity(self, node, args):
        return args[0]

    def op_dropout(self, node, args):
        return args[0]  # inference mode

    def op_pad(self, node, args):
        mode = _attr(node, "mode", b"constant")
        pads = _attr(node, "pads")
        if pads is None:
            pads = _np(args[1]).tolist()
        x = jnp.asarray(args[0])
        nd = x.ndim
        pairs = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
        if mode in (b"constant", "constant"):
            const = 0.0
            if len(args) > 2 and args[2] is not None:
                const = float(_np(args[2]))
            return jnp.pad(x, pairs, constant_values=const)
        return jnp.pad(x, pairs, mode="edge")

    def op_resize(self, node, args):
        x = jnp.asarray(args[0])
        sizes = None
        if len(args) > 3 and args[3] is not None:
            sizes = [int(s) for s in _np(args[3]).tolist()]
        elif len(args) > 2 and args[2] is not None:
            scales = _np(args[2]).astype(np.float64)
            if scales.size:
                sizes = [int(round(d * s)) for d, s in zip(x.shape, scales)]
        if sizes is None:
            raise NotImplementedError("Resize without scales/sizes")
        mode = _attr(node, "mode", b"nearest")
        method = "nearest" if mode in (b"nearest", "nearest") else "linear"
        return jax.image.resize(x, tuple(sizes), method=method)

    def op_spacetodepth(self, node, args):
        # NCHW blocks->channels, channel order (by, bx, c) per onnx spec:
        # reshape/transpose/reshape — matches models/scrfd._space_to_depth
        bs = int(_attr(node, "blocksize"))
        x = jnp.asarray(args[0])
        n, c, h, w = x.shape
        x = x.reshape(n, c, h // bs, bs, w // bs, bs)
        x = jnp.transpose(x, (0, 3, 5, 1, 2, 4))
        return x.reshape(n, c * bs * bs, h // bs, w // bs)

    def op_upsample(self, node, args):
        scales = _attr(node, "scales")
        if scales is None:
            scales = _np(args[1]).tolist()
        x = jnp.asarray(args[0])
        sizes = [int(round(d * s)) for d, s in zip(x.shape, scales)]
        mode = _attr(node, "mode", b"nearest")
        method = "nearest" if mode in (b"nearest", "nearest") else "linear"
        return jax.image.resize(x, tuple(sizes), method=method)

    # -------------------------------------------------- NHWC fast-path ops
    # Handlers return None to defer to the (untagging) base path. Conv
    # output is the only TAG SOURCE; everything else just propagates tags
    # through layout-agnostic math, so a graph with no conv runs exactly
    # as before.

    def _cdt(self, x):
        return x if self.compute_dtype is None else x.astype(self.compute_dtype)

    def nhwc_conv(self, node, args):
        x, w = args[0], args[1]
        if not isinstance(w, (np.ndarray, np.generic)):
            return None  # dynamic weights: stay on the reference path
        if isinstance(x, _NHWC):
            xa = x.a
        else:
            xa = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
        b = args[2] if len(args) > 2 else None
        strides = [int(s) for s in _attr(node, "strides", [1, 1])]
        dilations = [int(d) for d in _attr(node, "dilations", [1, 1])]
        group = int(_attr(node, "group", 1))
        (pt, pb), (pl_, pr) = _pads4(node)
        auto_pad = _attr(node, "auto_pad")
        if auto_pad and auto_pad not in (b"NOTSET", "NOTSET"):
            return None  # rare; keep the single tested auto_pad codepath
        w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW → HWIO
        y = jax.lax.conv_general_dilated(
            self._cdt(xa),
            self._cdt(w_hwio),
            window_strides=strides,
            padding=[(pt, pb), (pl_, pr)],
            rhs_dilation=dilations,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=group,
            preferred_element_type=jnp.float32,
        )
        if b is not None:
            y = y + jnp.asarray(b, jnp.float32).reshape(1, 1, 1, -1)
        return _NHWC(self._cdt(y))

    def nhwc_batchnormalization(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        scale, bias, mean, var = (
            jnp.asarray(a, jnp.float32) for a in args[1:5]
        )
        eps = float(_attr(node, "epsilon", 1e-5))
        inv = jax.lax.rsqrt(var + eps) * scale
        y = x.a * inv.reshape(1, 1, 1, -1) + (bias - mean * inv).reshape(
            1, 1, 1, -1
        )
        return _NHWC(self._cdt(y))

    def nhwc_prelu(self, node, args):
        x, slope = args[0], args[1]
        if not isinstance(x, _NHWC):
            return None
        s = jnp.asarray(slope)
        if s.ndim == 1:
            s = s.reshape(1, 1, 1, -1)
        elif s.ndim == 3:  # ONNX (C, 1, 1) → NHWC (1, 1, 1, C)
            s = s.reshape(1, 1, 1, -1) if s.shape[1:] == (1, 1) else None
            if s is None:
                return None
        else:
            return None
        return _NHWC(jnp.where(x.a >= 0, x.a, x.a * s.astype(x.a.dtype)))

    def _nhwc_unary(self, args, fn):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        return _NHWC(fn(x.a))

    def nhwc_relu(self, node, args):
        return self._nhwc_unary(args, lambda a: jnp.maximum(a, 0))

    def nhwc_leakyrelu(self, node, args):
        alpha = float(_attr(node, "alpha", 0.01))
        return self._nhwc_unary(args, lambda a: jnp.where(a >= 0, a, a * alpha))

    def nhwc_sigmoid(self, node, args):
        return self._nhwc_unary(args, jax.nn.sigmoid)

    def nhwc_identity(self, node, args):
        x = args[0]
        return x if isinstance(x, _NHWC) else None

    def nhwc_dropout(self, node, args):
        x = args[0]
        return x if isinstance(x, _NHWC) else None

    def nhwc_clip(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        lo = args[1] if len(args) > 1 and args[1] is not None else _attr(node, "min")
        hi = args[2] if len(args) > 2 and args[2] is not None else _attr(node, "max")
        a = x.a
        if lo is not None:
            a = jnp.maximum(a, jnp.asarray(lo).astype(a.dtype))
        if hi is not None:
            a = jnp.minimum(a, jnp.asarray(hi).astype(a.dtype))
        return _NHWC(a)

    def _nhwc_binop(self, args, fn):
        a, b = args
        if isinstance(a, _NHWC) and isinstance(b, _NHWC):
            return _NHWC(fn(a.a, b.a))
        for t, o in ((a, b), (b, a)):
            if isinstance(t, _NHWC) and _is_static(o):
                on = _np(o)
                if on.ndim == 0 or on.size == 1:
                    return _NHWC(fn(t.a, jnp.asarray(on.reshape(()))) if t is a
                                 else fn(jnp.asarray(on.reshape(())), t.a))
                if on.ndim == 4 and on.shape[0] == 1 and on.shape[2:] == (1, 1):
                    oc = jnp.asarray(np.transpose(on, (0, 2, 3, 1)))
                    return _NHWC(fn(t.a, oc) if t is a else fn(oc, t.a))
        return None

    def nhwc_add(self, node, args):
        return self._nhwc_binop(args, jnp.add)

    def nhwc_sub(self, node, args):
        return self._nhwc_binop(args, jnp.subtract)

    def nhwc_mul(self, node, args):
        return self._nhwc_binop(args, jnp.multiply)

    def nhwc_div(self, node, args):
        return self._nhwc_binop(args, jnp.divide)

    def nhwc_maxpool(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        if _attr(node, "auto_pad") not in (None, b"NOTSET", "NOTSET"):
            return None
        kh, kw = (int(k) for k in _attr(node, "kernel_shape"))
        sh, sw = (int(s) for s in _attr(node, "strides", [1, 1]))
        (pt, pb), (pl_, pr) = _pads4(node)
        y = jax.lax.reduce_window(
            x.a, jnp.asarray(-jnp.inf, x.a.dtype),
            jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), (pt, pb), (pl_, pr), (0, 0)),
        )
        return _NHWC(y)

    def nhwc_averagepool(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        if _attr(node, "auto_pad") not in (None, b"NOTSET", "NOTSET"):
            return None
        kh, kw = (int(k) for k in _attr(node, "kernel_shape"))
        sh, sw = (int(s) for s in _attr(node, "strides", [1, 1]))
        (pt, pb), (pl_, pr) = _pads4(node)
        summed = jax.lax.reduce_window(
            x.a.astype(jnp.float32), 0.0, jax.lax.add,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), (pt, pb), (pl_, pr), (0, 0)),
        )
        return _NHWC(self._cdt(summed / (kh * kw)))

    def nhwc_globalaveragepool(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        y = jnp.mean(x.a.astype(jnp.float32), axis=(1, 2), keepdims=True)
        return _NHWC(self._cdt(y))

    def nhwc_upsample(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        scales = _attr(node, "scales")
        if scales is None:
            if len(args) < 2 or not _is_static(args[1]):
                return None
            scales = _np(args[1]).tolist()
        sn, sc, sh, sw = (float(s) for s in scales)  # logical NCHW order
        a = x.a
        sizes = (
            int(round(a.shape[0] * sn)),
            int(round(a.shape[1] * sh)),
            int(round(a.shape[2] * sw)),
            int(round(a.shape[3] * sc)),
        )
        mode = _attr(node, "mode", b"nearest")
        method = "nearest" if mode in (b"nearest", "nearest") else "linear"
        return _NHWC(jax.image.resize(a, sizes, method=method))

    def nhwc_spacetodepth(self, node, args):
        x = args[0]
        if not isinstance(x, _NHWC):
            return None
        bs = int(_attr(node, "blocksize"))
        a = x.a
        n, h, w, c = a.shape
        a = a.reshape(n, h // bs, bs, w // bs, bs, c)
        # ONNX channel order (by, bx, c)
        a = jnp.transpose(a, (0, 1, 3, 2, 4, 5))
        return _NHWC(a.reshape(n, h // bs, w // bs, bs * bs * c))
