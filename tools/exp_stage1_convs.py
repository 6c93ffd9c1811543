"""Microbench: are XLA's stage-1 IResNet convs near roofline on TPU?

Stage1 (stem + 3 blocks at 112/56 px, 64 ch) measured 8.65 ms of the
22.3 ms 256-crop embed — ~16% MXU vs stage3's 46%. Analysis says the
112-px tensors are HBM-bound (~3.5 GB of activation traffic -> 4.3 ms
floor at 819 GB/s). This times each conv alone to see which ops are
pathological vs merely bandwidth-bound, plus alternative formulations.

Run in background: python tools/exp_stage1_convs.py [--iters 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    B = args.batch
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def timed(name, fn, *xs):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*xs)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        compile_s = time.time() - t0
        # honest timing: chain input on previous output's scalar
        def chained(x0, *rest):
            s = jnp.float32(0)
            x = x0
            for _ in range(args.iters):
                out = fn(x, *rest)
                s = s + jnp.sum(out.astype(jnp.float32)) * 1e-30
                x = x0 + s.astype(x0.dtype) * 0
            return s

        jch = jax.jit(chained)
        r = jch(*xs)
        float(r)
        t0 = time.time()
        r = jch(*xs)
        float(r)
        dt = (time.time() - t0) / args.iters * 1000.0
        print(f"{name:44s} {dt:8.3f} ms/iter  (compile {compile_s:.0f}s)", flush=True)
        return dt

    x112 = jnp.asarray(rng.standard_normal((B, 112, 112, 64)), jnp.bfloat16)
    x112_3 = jnp.asarray(rng.standard_normal((B, 112, 112, 3)), jnp.bfloat16)
    x56 = jnp.asarray(rng.standard_normal((B, 56, 56, 64)), jnp.bfloat16)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)), jnp.bfloat16)
    wstem = jnp.asarray(rng.standard_normal((3, 3, 3, 64)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((1, 1, 64, 64)), jnp.bfloat16)

    def conv(x, w, stride=1, pad=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    print(f"batch={B} device={jax.devices()[0]}", flush=True)
    # individual stage-1 convs
    timed("stem 3x3 3->64 @112", lambda x: conv(x, wstem), x112_3)
    t_c1 = timed("conv 3x3 64->64 @112 s1", lambda x: conv(x, w3), x112)
    timed("conv 3x3 64->64 @112 s2 (->56)", lambda x: conv(x, w3, stride=2), x112)
    timed("down 1x1 64->64 @112 s2", lambda x: conv(x, w1, stride=2, pad=0), x112)
    t_c56 = timed("conv 3x3 64->64 @56 s1", lambda x: conv(x, w3), x56)

    # roofline report for the @112 s1 conv
    flops = 2 * B * 112 * 112 * 9 * 64 * 64
    traffic = 2 * B * 112 * 112 * 64 * 2  # read+write bf16
    print(
        f"  @112 s1: {flops/1e9:.0f} GFLOP -> {flops/t_c1/1e9:.0f} TF/s "
        f"({100*flops/t_c1/1e9/394e3:.0f}% MXU); {traffic/1e6:.0f} MB -> "
        f"{traffic/t_c1/1e6:.0f} GB/s of 819",
        flush=True,
    )
    flops56 = 2 * B * 56 * 56 * 9 * 64 * 64
    print(
        f"  @56  s1: {flops56/1e9:.0f} GFLOP -> {flops56/t_c56/1e9:.0f} TF/s "
        f"({100*flops56/t_c56/1e9/394e3:.0f}% MXU)",
        flush=True,
    )

    # alternative: widen channels 64->128 with zero-padded weights (N fills
    # the MXU fully; 2x FLOPs). If this is ~same time, N=64 lane waste is
    # what's limiting, and an exact packed-stage1 transform could win.
    w3_128 = jnp.zeros((3, 3, 64, 128), jnp.bfloat16).at[..., :64].set(w3)
    timed("conv 3x3 64->128 @112 s1 (N-pad probe)", lambda x: conv(x, w3_128), x112)

    # alternative: f32 output (no bf16 cast) to see cast cost
    def conv_f32(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        )
    timed("conv 3x3 64->64 @112 s1 f32-out", lambda x: conv_f32(x, w3), x112)

    # whole stage1 stack as currently composed (folded inference shape):
    def stage1(x3):
        s = conv(x3, wstem)
        s = jnp.where(s >= 0, s, s * jnp.bfloat16(0.25))
        t = s * jnp.bfloat16(1.1) + jnp.bfloat16(0.05)  # bn1 affine
        u = conv(t, w3)
        u = jnp.where(u >= 0, u, u * jnp.bfloat16(0.25))
        v = conv(u, w3, stride=2)
        idn = conv(s, w1, stride=2, pad=0)
        r = v + idn
        for _ in range(2):
            t = r * jnp.bfloat16(1.1) + jnp.bfloat16(0.05)
            u2 = conv(t, w3)
            u2 = jnp.where(u2 >= 0, u2, u2 * jnp.bfloat16(0.25))
            r = conv(u2, w3) + r
        return r

    timed("stage1 full stack (stem+3 blocks)", stage1, x112_3)


if __name__ == "__main__":
    main()
