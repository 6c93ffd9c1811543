"""Measure the CPU reference baseline (VERDICT r1 'missing' item 4).

The reference runs det_500m + w600k_r50 through ONNX Runtime's CPU EP
with 4 intra-op threads, one image per Session::Run
(src/face_detector.cpp:10-11,179-183; src/face_recognizer.cpp:279-283;
hot loop src/main.cpp:214-257: detect every frame, embed every face).
No onnxruntime exists in this image, so the stand-in is torch-CPU
(oneDNN) running the SAME topologies (tests/oracles/torch_models.py)
with torch.set_num_threads(4) — the same class of optimized CPU
inference the reference uses, measured with the same per-frame
single-image loop.

Prints one JSON line; results are recorded in BASELINE.md.

Usage: python tools/cpu_reference_baseline.py [--frames 20] [--faces 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--faces", type=int, default=8,
                    help="faces embedded per frame (reference embeds every "
                    "face of every frame, main.cpp:226)")
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(args.threads)  # reference: SetIntraOpNumThreads(4)

    import jax

    jax.config.update("jax_platforms", "cpu")  # oracles touch jnp params

    from facerecognizeonnx_tpu.models import arcface, scrfd
    from tests.oracles.torch_models import iresnet_forward, scrfd_forward

    det_params = jax.device_get(scrfd.init_params(jax.random.PRNGKey(0)))
    arc_params = jax.device_get(arcface.init_params(jax.random.PRNGKey(1)))

    rng = np.random.default_rng(0)
    frame = rng.uniform(-1, 1, (1, 640, 640, 3)).astype(np.float32)
    crop = rng.uniform(-1, 1, (1, 112, 112, 3)).astype(np.float32)

    # warmup
    scrfd_forward(det_params, frame)
    iresnet_forward(arc_params, crop)

    t0 = time.time()
    for _ in range(args.frames):
        scrfd_forward(det_params, frame)
    det_ms = (time.time() - t0) / args.frames * 1000

    t0 = time.time()
    n_embed = args.frames * args.faces
    for _ in range(n_embed):
        iresnet_forward(arc_params, crop)
    emb_ms = (time.time() - t0) / n_embed * 1000

    # reference frame loop: 1 detect + faces × embed (align/normalize are
    # negligible next to the nets on CPU)
    frame_ms = det_ms + args.faces * emb_ms
    faces_per_sec = args.faces / (frame_ms / 1000.0)
    print(json.dumps({
        "metric": "CPU reference stand-in (torch oneDNN, 4 threads)",
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec",
        "detail": {
            "detect_ms_per_frame": round(det_ms, 1),
            "embed_ms_per_face": round(emb_ms, 1),
            "frame_ms": round(frame_ms, 1),
            "faces_per_frame": args.faces,
            "threads": args.threads,
        },
    }))


if __name__ == "__main__":
    main()
