"""Methodology check: is the headline number device-true?

Runs the fused pipeline as a lax.scan of 8 chained steps inside ONE
program — if per-dispatch timing were hiding tunnel overhead, this
would report materially higher throughput. Measured: 97.2 ms/step vs
96.5 per-dispatch, i.e. at ~100 ms per step the pipeline already hides
its own dispatch and bench.py's headline is device-true
(docs/PERFORMANCE.md "measurement discipline").

Run: python tools/exp_headline_scan.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax
from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
from facerecognizeonnx_tpu.utils.hostinit import init_on_host

B, K, INNER = 64, 8, 8
cfg = PipelineConfig(warp_impl="pallas")
det = init_on_host(lambda: scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(0))))
arc = init_on_host(lambda: arcface.fold_inference_params(arcface.init_params(jax.random.PRNGKey(1))))
rng = np.random.default_rng(0)
frames0 = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3), dtype=np.uint8))

def prog(frames):
    def body(f, _):
        dets, feats = frames_to_features(det, arc, f, cfg, max_faces_embed=K)
        bump = (jnp.abs(jnp.sum(feats)) * 0.0 + 1.0).astype(jnp.uint8)
        return f + bump, jnp.sum(feats)
    f2, ss = lax.scan(body, frames, None, length=INNER)
    return ss[-1], f2

jf = jax.jit(prog)
t0 = time.time()
s, f = jf(frames0)
float(s)
print(f"compile+first {time.time()-t0:.1f}s", flush=True)
for _ in range(2):
    s, f = jf(f)
float(s)
t0 = time.time()
outer = 4
for _ in range(outer):
    s, f = jf(f)
float(s)
dt = (time.time() - t0) / (outer * INNER)
print(f"scan-amortized: {B*K/dt:,.0f} faces/sec ({dt*1e3:.2f} ms/step of {B} frames)", flush=True)
