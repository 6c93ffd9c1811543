"""End-to-end TPU benchmark — prints ONE JSON line.

Headline metric (BASELINE.json): faces/sec/chip end-to-end
(detect + align + embed), target ≥5000 on a TPU v5e chip. The measured
program is pipeline/fused.frames_to_features: a batch of letterboxed
640x640 frames → SCRFD detect → decode → NMS → align → ArcFace embed,
one XLA program, K=8 faces embedded per frame (all K slots are computed
whether or not a real face occupies them, so the number is honest about
the full align+embed cost).

Usage: python bench.py [--batch B] [--iters N] [--cpu] [--json-only]
"""

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_FACES_PER_SEC = 5000.0  # BASELINE.md build target
FACES_PER_FRAME = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.models import arcface, scrfd
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    def log(*a):
        if not args.json_only:
            print(*a, file=sys.stderr)

    cfg = PipelineConfig()  # bf16 compute
    log(f"device: {jax.devices()[0]}")
    t0 = time.time()
    det_params = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arc_params = init_on_host(lambda: arcface.init_params(jax.random.PRNGKey(1)))
    log(f"init {time.time() - t0:.1f}s")

    @jax.jit
    def step(frames):
        dets, feats = frames_to_features(
            det_params, arc_params, frames, cfg, max_faces_embed=FACES_PER_FRAME
        )
        return feats

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 640, 640, 3), dtype=np.uint8)
    )

    t0 = time.time()
    jax.block_until_ready(step(frames))
    log(f"compile+first run {time.time() - t0:.1f}s")
    for _ in range(2):
        jax.block_until_ready(step(frames))

    t0 = time.time()
    for _ in range(args.iters):
        out = step(frames)
    jax.block_until_ready(out)
    dt = time.time() - t0

    frames_per_sec = args.batch * args.iters / dt
    faces_per_sec = frames_per_sec * FACES_PER_FRAME
    result = {
        "metric": "faces/sec/chip end-to-end (detect+align+embed)",
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / TARGET_FACES_PER_SEC, 3),
        "detail": {
            "frames_per_sec": round(frames_per_sec, 1),
            "p50_frame_latency_ms": round(1000.0 * dt / args.iters, 2),
            "batch": args.batch,
            "faces_per_frame": FACES_PER_FRAME,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
