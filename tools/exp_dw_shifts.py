"""A/B: depthwise 3x3 as grouped lax.conv vs 9 shifted elementwise FMAs.

The SCRFD-500m detector is VPU-bound in its depthwise convs (~2% MXU,
docs/PERFORMANCE.md). A shifts formulation turns each dw conv into 9
strided-slice multiplies XLA can fuse with the surrounding
BN/PReLU chains (grouped convs are opaque to fusion), potentially
removing full-tensor HBM passes at 320px resolutions.

Run: python tools/exp_dw_shifts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    from facerecognizeonnx_tpu.models import scrfd
    from facerecognizeonnx_tpu.ops.image import normalize_to_rgb
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    INNER = 10

    def timed(name, fn, x0, outer=3):
        def prog(x):
            def body(x, _):
                s = fn(x)
                return (x.astype(jnp.float32) + s * 1e-30).astype(x0.dtype), s
            xf, ss = lax.scan(body, x, None, length=INNER)
            return ss[-1], xf
        jf = jax.jit(prog)
        t0 = time.time()
        s, x = jf(x0)
        float(s)
        print(f"{name}: compile {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        for _ in range(outer):
            s, x = jf(x)
        float(s)
        dt = (time.time() - t0) / (outer * INNER) * 1000
        print(f"{name}: {dt:8.3f} ms", flush=True)
        return dt

    rng = np.random.default_rng(0)

    # --- isolated dw conv at the detector's hottest shape
    B, H, C = 32, 160, 40
    x = jnp.asarray(rng.standard_normal((B, H, H, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.bfloat16)

    def dw_conv(x):
        y = lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    def dw_shifts(x):
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        acc = None
        for ky in range(3):
            for kx in range(3):
                term = xp[:, ky:ky + H, kx:kx + H, :] * w[ky, kx, 0]
                acc = term if acc is None else acc + term
        return jnp.sum(acc.astype(jnp.float32))

    print(f"isolated dw 3x3 {B}x{H}x{H}x{C}:", flush=True)
    t_c = timed("  grouped conv", dw_conv, x)
    t_s = timed("  9-tap shifts", dw_shifts, x)
    print(f"  ratio shifts/conv: {t_s/t_c:.3f}", flush=True)

    # --- full SCRFD forward with dw convs swapped to shifts
    cfg = PipelineConfig()
    det = init_on_host(
        lambda: scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(0)))
    )
    frames = jnp.asarray(rng.integers(0, 256, (32, 640, 640, 3), dtype=np.uint8))
    dtype = jnp.bfloat16

    def fwd_baseline(f):
        xx = normalize_to_rgb(f, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
        outs = scrfd.apply(det, xx, compute_dtype=dtype)
        return sum(jnp.sum(v[0]) for v in outs.values())

    # monkey-patched conv2d: route depthwise through shifts
    from facerecognizeonnx_tpu.models import layers as L

    orig_conv2d = L.conv2d

    BARRIER = [True]

    def conv2d_shifts(params, x, stride=1, padding=0, groups=1, compute_dtype=jnp.float32):
        cin = x.shape[-1]
        if groups == cin and groups > 1 and params["w"].shape[0] == 3:
            wl = params["w"].astype(compute_dtype)  # (3,3,1,C)
            xp = jnp.pad(
                x.astype(compute_dtype),
                [(0, 0), (padding, padding), (padding, padding), (0, 0)],
            )
            if BARRIER[0]:
                # stop XLA from fusing the producer chain into all 9 tap
                # reads (which would multiply its HBM traffic 9x): the
                # padded tensor materializes ONCE, and the fused 9-tap
                # loop reads it with tile locality
                xp = lax.optimization_barrier(xp)
            Ho = (x.shape[1] + 2 * padding - 3) // stride + 1
            acc = None
            for ky in range(3):
                for kx in range(3):
                    sl = xp[:, ky:ky + stride * Ho:stride,
                            kx:kx + stride * Ho:stride, :]
                    term = sl * wl[ky, kx, 0]
                    acc = term if acc is None else acc + term
            if "b" in params:
                acc = acc + params["b"].astype(acc.dtype)
            return acc.astype(compute_dtype)
        return orig_conv2d(params, x, stride, padding, groups, compute_dtype)

    def fwd_shifts(f):
        L.conv2d_backup = L.conv2d
        try:
            L.conv2d = conv2d_shifts
            import importlib
            # scrfd module references L.conv2d at call time → patch works
            xx = normalize_to_rgb(f, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
            outs = scrfd.apply(det, xx, compute_dtype=dtype)
            return sum(jnp.sum(v[0]) for v in outs.values())
        finally:
            L.conv2d = L.conv2d_backup

    print("full SCRFD fwd (32x640):", flush=True)
    t_b = timed("  baseline", fwd_baseline, frames)
    BARRIER[0] = False
    t_p = timed("  dw-as-shifts (fused)", fwd_shifts, frames)
    print(f"  ratio fused: {t_p/t_b:.3f}", flush=True)
    BARRIER[0] = True
    t_p2 = timed("  dw-as-shifts (barrier)", fwd_shifts, frames)
    print(f"  ratio barrier: {t_p2/t_b:.3f}", flush=True)


if __name__ == "__main__":
    main()
