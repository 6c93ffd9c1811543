"""A/B the x-major (v5) warp kernel vs the shipping y-major kernel on TPU.

The x-major transposed-pyramid layout (docs/PERFORMANCE.md round-2
"remaining candidate") turns the x-pass cross-lane reduction — the
single largest VPU phase in the warp accounting (~28 µs of 66 µs/face)
— into a sublane reduce over 16 vregs. Variants measured same-session:

  A  ymajor raw f32 BGR           (v3a, the shipping kernel)
  B  xmajor raw f32 BGR           (layout change alone)
  C  xmajor + arcface epilogue    (embed-ready bf16 normalized RGB out)
  D  xmajor + valid mask, 8/8 set (skip-machinery overhead check)
  E  xmajor + valid mask, 2/8 set (real-world sparse-slot win)

Run: python tools/exp_warp_xmajor.py [--faces 256] [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.ops.warp_pallas import warp_affine_pallas

    B, K = 32, args.faces // 32
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3), dtype=np.uint8))
    theta = rng.uniform(-0.8, 0.8, (B, K))
    scale = rng.uniform(0.3, 1.6, (B, K))
    tx = rng.uniform(-40, 40, (B, K))
    ty = rng.uniform(-40, 40, (B, K))
    a = scale * np.cos(theta)
    b = -scale * np.sin(theta)
    Ms = np.zeros((B, K, 2, 3), np.float32)
    Ms[..., 0, 0] = a
    Ms[..., 0, 1] = b
    Ms[..., 0, 2] = 56 * (1 - a) - 56 * b + tx + 200
    Ms[..., 1, 0] = -b
    Ms[..., 1, 1] = a
    Ms[..., 1, 2] = 56 * b + 56 * (1 - a) + ty + 200
    Ms = jnp.asarray(Ms)

    valid_all = jnp.ones((B, K), bool)
    valid_2of8 = jnp.asarray(np.arange(K)[None, :] < max(K // 4, 1)).repeat(B, 0)

    def timed(name, **kw):
        fn = jax.jit(
            lambda f: (
                lambda c: (jnp.sum(c.astype(jnp.float32)),
                           f + (jnp.abs(jnp.sum(c.astype(jnp.float32))) * 0 + 1).astype(jnp.uint8))
            )(warp_affine_pallas(f, Ms, **kw))
        )
        t0 = time.time()
        s, f2 = fn(frames)
        float(s)
        print(f"{name}: compile+run {time.time() - t0:.1f}s", flush=True)
        for _ in range(2):
            s, f2 = fn(f2)
        float(s)
        t0 = time.time()
        for _ in range(args.iters):
            s, f2 = fn(f2)
        float(s)
        dt = (time.time() - t0) / args.iters * 1000
        print(f"{name}: {dt:7.2f} ms / {B * K} faces", flush=True)
        return dt

    def try_timed(name, **kw):
        # per-variant isolation: the y-major kernel cannot compile at
        # 1024 faces (its (N, k) scalar tables alone exhaust SMEM — the
        # reason the x-major kernel merged them), and one variant's
        # failure must not sink the others' numbers
        try:
            return timed(name, **kw)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None

    t_b = try_timed("B xmajor raw", layout="xmajor")
    t_c = try_timed("C xmajor epilogue", layout="xmajor", epilogue=(127.5, 128.0))
    t_d = try_timed("D xmajor valid 8/8", layout="xmajor", valid=valid_all)
    t_e = try_timed("E xmajor valid 2/8", layout="xmajor", valid=valid_2of8)
    t_a = try_timed("A ymajor raw (round-2 kernel)")
    if t_a and t_b:
        print(f"B/A {t_b/t_a:.3f}  C/A {t_c/t_a:.3f}  D/B {t_d/t_b:.3f}  "
              f"E/D {t_e/t_d:.3f}", flush=True)

    if t_a is None:
        return  # y-major unavailable at this face count: skip parity
    # numeric parity on device
    c_a = np.asarray(jax.jit(lambda f: warp_affine_pallas(f, Ms))(frames))
    c_b = np.asarray(
        jax.jit(lambda f: warp_affine_pallas(f, Ms, layout="xmajor"))(frames)
    )
    d = np.abs(c_a - c_b)
    print(f"xm vs ym deviation: max={d.max():.3f} p99={np.percentile(d, 99):.3f}",
          flush=True)
    c_c = np.asarray(
        jax.jit(lambda f: warp_affine_pallas(
            f, Ms, layout="xmajor", epilogue=(127.5, 128.0)))(frames)
    ).astype(np.float32)
    want = (c_a[..., ::-1] - 127.5) / 128.0
    d2 = np.abs(c_c - want)
    print(f"epilogue deviation vs normalize(ym): max={d2.max():.4f}", flush=True)


if __name__ == "__main__":
    main()
