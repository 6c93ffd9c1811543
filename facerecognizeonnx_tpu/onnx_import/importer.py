"""User-facing ONNX loaders.

OnnxRunner wraps a parsed graph as a drop-in for the native models'
`apply` contracts, so FaceDetector/FaceRecognizer work unchanged with
real buffalo_sc .onnx files (reference: src/main.cpp:269-270 loads
models/det_500m.onnx + models/w600k_r50.onnx):

  kind="scrfd":   apply(x_nhwc) → {stride: (scores, bbox, kps)} with
                  post-sigmoid scores and stride-unit distances — the
                  exact contract of models/scrfd.py (the exported SCRFD
                  graph already ends in sigmoid, and emits distances
                  BEFORE the ×stride scaling, per InsightFace decode)
  kind="arcface": apply(x_nhwc) → (B, 512) float32 features

Output classification for SCRFD is done by SHAPE, not name: per stride s
there are rows = A·(S/s)² anchors with 1/4/10 columns — robust across
exports that rename tensors.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facerecognizeonnx_tpu.onnx_import import proto
from facerecognizeonnx_tpu.onnx_import.executor import Executor


class OnnxRunner:
    def __init__(self, path: str, kind: Optional[str] = None,
                 fast: bool = True):
        """fast=True executes the graph in the NHWC/HWIO layout XLA:TPU
        wants (executor.py NHWC fast path) — the TPU-speed route for
        graphs the native mappers can't claim (det_500m's NAS backbone);
        fast=False keeps the reference NCHW interpretation."""
        self.path = path
        self.graph = proto.load_model(path)
        self.executor = Executor(self.graph, nhwc=fast)
        self.fast = fast
        if not self.executor.input_names:
            raise ValueError(f"{path}: graph has no runtime inputs")
        self.input_name = self.executor.input_names[0]
        in_shape = dict(self.graph.inputs).get(self.input_name)
        self.input_size = None
        if in_shape and len(in_shape) == 4 and in_shape[2] and in_shape[2] > 0:
            self.input_size = int(in_shape[2])
        if kind is None:
            # 112 → recognizer; anything else (incl. dynamic) → detector,
            # mirroring the reference's default-size fallback logic
            # (src/face_detector.cpp:39-57).
            kind = "arcface" if self.input_size == 112 else "scrfd"
        self.kind = kind

    # The pipelines call params.apply(...) / treat this as the model.
    def apply(self, x_nhwc: jnp.ndarray, compute_dtype=jnp.float32):
        if self.fast:
            # feed NHWC straight in — the fast path's conv-dense segments
            # never leave NHWC, and conv math runs at compute_dtype with
            # f32 accumulation like the native models
            self.executor.compute_dtype = (
                None if compute_dtype in (jnp.float32, None) else compute_dtype
            )
            outs = self.executor.run(
                {self.input_name: x_nhwc.astype(jnp.float32)},
                nhwc_inputs=True,
            )
        else:
            x = jnp.transpose(x_nhwc.astype(jnp.float32), (0, 3, 1, 2))  # NCHW
            outs = self.executor.run({self.input_name: x})
        if self.kind == "arcface":
            feats = jnp.asarray(outs[0])
            return feats.reshape(feats.shape[0], -1).astype(jnp.float32)
        return self._classify_scrfd(outs, int(x_nhwc.shape[1]))

    def _classify_scrfd(
        self, outs, input_size: int, num_anchors: int = 2
    ) -> Dict[int, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        by_stride: Dict[int, dict] = {}
        for o in outs:
            o = jnp.asarray(o)
            if o.ndim == 2:  # (N, C) with batch folded
                o = o[None]
            rows, cols = int(o.shape[1]), int(o.shape[2])
            hw = rows // num_anchors
            side = int(math.isqrt(hw))
            if side * side != hw:
                raise ValueError(f"cannot classify SCRFD output rows={rows}")
            stride = input_size // side
            by_stride.setdefault(stride, {})[cols] = o
        result = {}
        for stride, tensors in by_stride.items():
            if set(tensors) != {1, 4, 10}:
                raise ValueError(
                    f"stride {stride}: expected score/bbox/kps outputs, "
                    f"got columns {sorted(tensors)}"
                )
            result[stride] = (tensors[1], tensors[4], tensors[10])
        return result


def load_onnx_params(path: str, kind: Optional[str] = None) -> OnnxRunner:
    """api._load_weights hook: .onnx path → pipeline-compatible runner."""
    return OnnxRunner(path, kind=kind)
