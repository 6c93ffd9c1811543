"""Probe: does XLA emit native int8 convs/matmuls on this TPU?

v5e's MXU runs int8 at 2x bf16 peak AND int8 activations halve HBM
traffic (which bounds IResNet stage1). If lax.conv with int8 operands /
int32 accumulation is native (not upcast-emulated), a w8a8 PTQ embed
config is worth building. Times bf16 vs int8 at stage1/stage3 shapes.

Run: python tools/exp_int8_conv.py
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

    iters = 20
    rng = np.random.default_rng(0)
    dn = ("NHWC", "HWIO", "NHWC")

    def timed(name, fn, *xs):
        jfn = jax.jit(fn)
        t0 = time.time()
        out = jfn(*xs)
        float(jnp.sum(out.astype(jnp.float32)))
        compile_s = time.time() - t0

        def chained(x0, *rest):
            s = jnp.float32(0)
            x = x0
            for _ in range(iters):
                out = fn(x, *rest)
                s = s + jnp.sum(out.astype(jnp.float32)) * 1e-30
                x = (x0.astype(jnp.float32) + s * 0).astype(x0.dtype)
            return s

        jch = jax.jit(chained)
        float(jch(*xs))
        t0 = time.time()
        float(jch(*xs))
        dt = (time.time() - t0) / iters * 1000.0
        print(f"{name:46s} {dt:8.3f} ms/iter  (compile {compile_s:.0f}s)", flush=True)
        return dt

    B = 256
    print(f"device={jax.devices()[0]}", flush=True)

    # stage3 shape: (B,14,14,256)->256, the MXU-bound bulk of IResNet
    x3b = jnp.asarray(rng.standard_normal((B, 14, 14, 256)), jnp.bfloat16)
    w3b = jnp.asarray(rng.standard_normal((3, 3, 256, 256)), jnp.bfloat16)
    x3i = jnp.asarray(rng.integers(-127, 128, (B, 14, 14, 256)), jnp.int8)
    w3i = jnp.asarray(rng.integers(-127, 128, (3, 3, 256, 256)), jnp.int8)

    def conv_bf16(x, w, stride=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def conv_i8(x, w, stride=1):
        return lax.conv_general_dilated(
            x, w, (stride, stride), [(1, 1), (1, 1)],
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )

    def conv_i8_to_i8(x, w, stride=1):
        y = conv_i8(x, w, stride)
        # requant: scale + clamp back to int8 (what a real w8a8 layer does)
        return jnp.clip(
            (y.astype(jnp.float32) * jnp.float32(0.001)).astype(jnp.int32), -127, 127
        ).astype(jnp.int8)

    t_b = timed("stage3 conv bf16 (256ch @14)", conv_bf16, x3b, w3b)
    t_i = timed("stage3 conv int8->int32", conv_i8, x3i, w3i)
    t_i2 = timed("stage3 conv int8->requant->int8", conv_i8_to_i8, x3i, w3i)
    print(f"  int8/bf16 ratio: {t_i/t_b:.2f} (raw), {t_i2/t_b:.2f} (requant)", flush=True)

    # stage1 shape: (B,112,112,64)->64 — HBM-bound in bf16
    x1b = jnp.asarray(rng.standard_normal((B, 112, 112, 64)), jnp.bfloat16)
    w1b = jnp.asarray(rng.standard_normal((3, 3, 64, 64)), jnp.bfloat16)
    x1i = jnp.asarray(rng.integers(-127, 128, (B, 112, 112, 64)), jnp.int8)
    w1i = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)
    t_b1 = timed("stage1 conv bf16 (64ch @112)", conv_bf16, x1b, w1b)
    t_i1 = timed("stage1 conv int8->requant->int8", conv_i8_to_i8, x1i, w1i)
    print(f"  int8/bf16 ratio @112: {t_i1/t_b1:.2f}", flush=True)

    # plain matmul sanity: (8192,512)@(512,512)
    a_b = jnp.asarray(rng.standard_normal((8192, 512)), jnp.bfloat16)
    b_b = jnp.asarray(rng.standard_normal((512, 512)), jnp.bfloat16)
    a_i = jnp.asarray(rng.integers(-127, 128, (8192, 512)), jnp.int8)
    b_i = jnp.asarray(rng.integers(-127, 128, (512, 512)), jnp.int8)
    t_mb = timed("matmul bf16 8192x512x512", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), a_b, b_b)
    t_mi = timed("matmul int8 8192x512x512", lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32), a_i, b_i)
    print(f"  int8/bf16 matmul ratio: {t_mi/t_mb:.2f}", flush=True)


if __name__ == "__main__":
    main()
