"""The multi-chip scaling surface on one page: dp, tp, pp, ep, dp x pp x tp.

The reference is a single-process CPU app (one frame, one face at a
time — reference src/main.cpp:214-257); this framework's equivalents
scale the same pipeline over a `jax.sharding.Mesh`:

  dp  — sharded_frames_to_features: frames shard over "data", params
        replicated, zero collectives on the forward path.
  tp  — tp_embed_crops: the recognizer Megatron channel-sharded over
        "model" (1/P of the weights per chip; one psum per IResNet
        block, two per ViT block).
  pp  — pipelined_frames_to_features: detect+align | embed as a
        2-stage microbatch pipeline over "stage" (lax.ppermute wires).
  3ax — the same call with BOTH a "data" and a "model" axis: the embed
        stage runs tensor-parallel inside the pipeline.
  ep  — ep_embed_crops: specialist recognizers (same architecture,
        different weights), one resident per "expert" shard; faces are
        routed to their expert via all_to_all (the MoE pattern).

All of these reproduce the single-program result exactly (the
parallelism is an execution choice, not a semantic one), and all
run below on an 8-device virtual CPU mesh — no TPU pod needed to try
it. On real hardware, drop the XLA_FLAGS line and the same code runs
over ICI.

Run:  python examples/parallel_inference.py
"""

import os
import sys

# APPEND to any existing XLA_FLAGS (setdefault would silently skip the
# 8-device forcing on hosts that already export flags, and the meshes
# below would then fail on a 1-device platform)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The demo targets the virtual 8-device CPU mesh so it runs anywhere.
# (Set in-process BEFORE any backend query — querying first would
# initialize whatever platform sitecustomize picked and make this a
# no-op.) On a real multi-chip host: delete these two lines and the
# XLA_FLAGS default above; the code below is unchanged.
if not os.environ.get("FRT_EXAMPLE_REAL_DEVICES"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, ".")

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.parallel.mesh import make_mesh
from facerecognizeonnx_tpu.parallel.pipeline_stage import (
    pipelined_frames_to_features,
)
from facerecognizeonnx_tpu.parallel.sharded_ops import (
    sharded_frames_to_features,
)
from facerecognizeonnx_tpu.parallel.tensor_parallel import tp_embed_crops
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

cfg = PipelineConfig(
    det_input_size=128, compute_dtype="float32", pre_nms_topk=64, max_faces=16
)
det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
arc = init_on_host(
    lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
)
rng = np.random.default_rng(0)
frames = rng.integers(0, 256, (8, 128, 128, 3)).astype(np.uint8)
devices = jax.devices()[:8]

# dp: linear throughput scaling, zero forward-path collectives
dmesh = make_mesh(("data",), (8,), devices=devices)
dets, feats = sharded_frames_to_features(
    det, arc, frames, cfg, mesh=dmesh, max_faces_embed=4
)
print("dp      feats", np.asarray(feats).shape)

# tp: the recognizer sharded across chips (small-batch latency lever)
tmesh = make_mesh(("data", "model"), (4, 2), devices=devices)
crops = rng.integers(0, 256, (8, 112, 112, 3)).astype(np.uint8)
feats_tp = tp_embed_crops(arc, crops, cfg, mesh=tmesh)
print("dp x tp feats", np.asarray(feats_tp).shape)

# pp: detect chips and embed chips, microbatches over the wire
pmesh = make_mesh(("data", "stage"), (4, 2), devices=devices)
dets_pp, feats_pp = pipelined_frames_to_features(
    det, arc, frames, cfg, mesh=pmesh, max_faces_embed=4, n_micro=2
)
np.testing.assert_allclose(
    np.asarray(feats_pp), np.asarray(feats), rtol=1e-4, atol=1e-5
)
print("dp x pp feats", np.asarray(feats_pp).shape, "(== dp result)")

# dp x pp x tp: all three on one 3-axis mesh
mesh3 = make_mesh(("data", "stage", "model"), (2, 2, 2), devices=devices)
dets_3, feats_3 = pipelined_frames_to_features(
    det, arc, frames, cfg, mesh=mesh3, max_faces_embed=4, n_micro=2
)
np.testing.assert_allclose(
    np.asarray(feats_3), np.asarray(feats), rtol=1e-4, atol=1e-5
)
print("dp x pp x tp feats", np.asarray(feats_3).shape, "(== dp result)")

# ep: specialist recognizers (e.g. frontal/profile fine-tunes of ONE
# architecture), one resident per "expert" shard; each face crosses to
# its expert's chip via all_to_all and its feature rides back
from facerecognizeonnx_tpu.parallel.expert_parallel import (  # noqa: E402
    ep_embed_crops,
    route_by_yaw,
)

frontal = arc
profile = init_on_host(
    lambda: arcface.init_params(jax.random.PRNGKey(2), arch="iresnet18")
)
emesh = make_mesh(("data", "expert"), (4, 2), devices=devices)
kps = rng.uniform(10, 100, (8, 5, 2)).astype(np.float32)  # raw landmarks
ids = route_by_yaw(kps, 2)  # or any learned/heuristic gate
feats_ep, routed = ep_embed_crops(
    [frontal, profile], ids, crops, cfg, mesh=emesh, data_axis="data"
)
print(
    "dp x ep feats", np.asarray(feats_ep).shape,
    f"({int(np.asarray(routed).sum())}/8 routed)",
)
