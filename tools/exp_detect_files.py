"""Probe: bulk file detection throughput (detect_files).

Question: with the native C++ loader (JPEG decode + letterbox in C++,
GIL released) feeding fixed-shape padded batches, what does end-to-end
files→FaceBoxes run at, and is it host-decode-bound or device-bound on
this single-core host?

Method: N synthetic 640x480 JPEGs on tmpfs; time (a) the loader alone
(decode+letterbox, no device), (b) detect_files end to end, (c) the
padded-batch device program alone on pre-letterboxed frames (chained
dispatches). Honest timing: block_until_ready, warm programs, median of
repeats for (b)/(c).

Run: PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/exp_detect_files.py [N] [batch]
"""

import io
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from PIL import Image

    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.pipeline.api import FaceDetector
    from facerecognizeonnx_tpu.runtime import native

    assert native.codecs_available()
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="frt_bulk_")
    paths = []
    base = rng.integers(0, 256, (480, 640, 3), np.uint8)
    for i in range(n):
        buf = io.BytesIO()
        Image.fromarray(np.roll(base, 7 * i, axis=1)).save(
            buf, "JPEG", quality=90
        )
        p = os.path.join(tmp, f"f{i}.jpg")
        with open(p, "wb") as f:
            f.write(buf.getvalue())
        paths.append(p)
    sz = os.path.getsize(paths[0]) / 1e3
    print(f"{n} jpegs of {sz:.0f} KB, batch={batch}")

    det = FaceDetector(PipelineConfig())
    det.load_model()

    # (a) loader alone
    t0 = time.perf_counter()
    cnt = sum(
        1 for _ in native.NativeImageLoader(paths, det.cfg.det_input_size)
    )
    t_load = time.perf_counter() - t0
    print(f"loader alone: {cnt} files in {t_load:.2f}s "
          f"({n / t_load:.0f} files/sec, {1e3 * t_load / n:.2f} ms/file)")

    # (b) end to end (first call compiles; then repeats)
    det.detect_files(paths[: 2 * batch], batch_size=batch)  # warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = det.detect_files(paths, batch_size=batch)
        times.append(time.perf_counter() - t0)
    t_e2e = float(np.median(times))
    n_faces = sum(len(r) for r in res)
    print(f"detect_files e2e: {t_e2e:.2f}s median "
          f"({n / t_e2e:.0f} files/sec; {n_faces} faces)")

    # (c) device program alone on pre-letterboxed frames
    import jax
    import jax.numpy as jnp

    frames = np.zeros((batch, det.cfg.det_input_size,
                       det.cfg.det_input_size, 3), np.uint8)
    with native.NativeImageLoader(paths[:batch],
                                  det.cfg.det_input_size) as L:
        for idx, fr, sc in L:
            frames[idx % batch] = fr
    fn = det._jit_cache[("padded_batch", batch)]
    scales = jnp.ones(batch, jnp.float32)
    dev = jnp.asarray(frames)
    jax.block_until_ready(fn(dev, scales))
    reps = max(1, n // batch)
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(dev, scales)
    jax.block_until_ready(out)
    t_dev = time.perf_counter() - t0
    print(f"device program alone: {reps}x batch {batch} in {t_dev:.2f}s "
          f"({reps * batch / t_dev:.0f} frames/sec)")
    print(f"verdict: host decode {1e3 * t_load / n:.1f} ms/file vs device "
          f"{1e3 * t_dev / (reps * batch):.1f} ms/frame → "
          f"{'HOST-bound' if t_load > t_dev else 'DEVICE-bound'} "
          f"(overlap hides the smaller side)")


if __name__ == "__main__":
    main()
