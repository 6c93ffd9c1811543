"""Measure the detect-only batched program vs the fused program.

This is the steady-state device cost of tracked video
(pipeline/track.py): frames whose tracks are all cached run ONLY
detect_batch_program; the fused detect+align+embed re-runs just for
new/refresh-due tracks. The gap between the two numbers is the device
time the embedding cache saves per cached frame.

Chained-input + host-fetch timing, same discipline as bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.detect.pipeline import detect_batch_program
from facerecognizeonnx_tpu.models import arcface, scrfd
from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
from facerecognizeonnx_tpu.utils.hostinit import init_on_host


def timed(name, step, frames, iters=20):
    t0 = time.time()
    out, frames = step(frames)
    float(jnp.sum(out))
    print(f"{name}: compile+first {time.time() - t0:.1f}s", flush=True)
    for _ in range(2):
        out, frames = step(frames)
    float(jnp.sum(out))
    t0 = time.time()
    for _ in range(iters):
        out, frames = step(frames)
    float(jnp.sum(out))
    dt = (time.time() - t0) / iters * 1000.0
    print(f"{name}: {dt:8.2f} ms / step", flush=True)
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    cfg = PipelineConfig(warp_impl="pallas", skip_invalid_faces=False)
    det = init_on_host(
        lambda: scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(0)))
    )
    arc = init_on_host(
        lambda: arcface.fold_inference_params(arcface.init_params(jax.random.PRNGKey(1)))
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (batch, 640, 640, 3), dtype=np.uint8)
    )

    @jax.jit
    def step_detect(f):
        d = detect_batch_program(det, f, cfg)
        bump = (jnp.abs(jnp.sum(d.scores)) * 0.0 + 1.0).astype(jnp.uint8)
        return d.scores, f + bump

    @jax.jit
    def step_fused(f):
        _d, feats = frames_to_features(det, arc, f, cfg, max_faces_embed=8)
        bump = (jnp.abs(jnp.sum(feats)) * 0.0 + 1.0).astype(jnp.uint8)
        return feats, f + bump

    print(f"device: {jax.devices()[0]} batch={batch}", flush=True)
    t_d = timed("detect-only", step_detect, frames)
    t_f = timed("fused      ", step_fused, frames)
    print(
        f"detect-only/fused = {t_d / t_f:.3f}; cached-frame saving "
        f"{t_f - t_d:.1f} ms/step ({batch} frames)", flush=True,
    )
    print(
        f"tracked steady-state device rate ~= "
        f"{batch / t_d * 1000.0:.0f} frames/sec "
        f"(fused-every-frame: {batch / t_f * 1000.0:.0f})", flush=True,
    )


if __name__ == "__main__":
    main()
