"""AOT deployment bundles: build once, serve from the artifact.

Build machine (no TPU needed — the Mosaic warp kernel serializes at
trace time):

    python -m facerecognizeonnx_tpu export pipeline.frtz --batch 8
    # or programmatically, targeting TPU from a CPU host:
    #   save_bundle(..., platforms=["tpu"])

Serving host (no model-building Python runs — the program is the
serialized trace; XLA does only its per-chip binary compile, amortized
by the persistent compilation cache):

    python -m facerecognizeonnx_tpu serve --aot pipeline.frtz

This example does the whole loop in-process on small shapes.
"""

import sys

import jax
import numpy as np

sys.path.insert(0, ".")

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.pipeline.aot import load_bundle, save_bundle
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

SIZE = 128
cfg = PipelineConfig(
    det_input_size=SIZE, compute_dtype="float32", pre_nms_topk=64,
    max_faces=16, rec_arch="iresnet18",
)

# --- build step: trace + export + write one file -------------------------
det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
arc = init_on_host(
    lambda: arcface.init_params(jax.random.PRNGKey(1), arch="iresnet18")
)
save_bundle("/tmp/example.frtz", det, arc, cfg, batch=2, max_faces_embed=4)
print("exported /tmp/example.frtz")

# --- serving step: load + run (a fresh process would work identically) ---
pipe = load_bundle("/tmp/example.frtz")
frames = np.random.default_rng(0).integers(
    0, 256, (pipe.batch, SIZE, SIZE, 3)
).astype(np.uint8)
boxes, scores, kps, valid, feats = pipe(frames)
print("features:", np.asarray(feats).shape)

# --- weight refresh without re-export ------------------------------------
arc_v2 = init_on_host(
    lambda: arcface.init_params(jax.random.PRNGKey(2), arch="iresnet18")
)
pipe.swap_params(arc_params=arc_v2)
feats_v2 = np.asarray(pipe(frames)[4])
print("weights swapped; features changed:",
      bool(np.abs(feats_v2 - np.asarray(feats)).max() > 0))
