"""Probe: can stage-1's 64-channel convs fill the 128 output lanes by
packing TWO crops into one conv? (docs/ROADMAP.md round-3 item 1)

Three candidate formulations for the SAME work (2N crops through a
64->64 3x3 conv):
  A. baseline          conv(2N, H, W, 64) -> 64
  B. grouped           conv(N, H, W, 128) -> 128, feature_group_count=2
                       (crop pair stacked in channels; groups keep the
                       crops independent, so semantics are exact)
  C. block-diagonal    conv(N, H, W, 128) -> 128 with weights
                       [[W,0],[0,W]] — full lanes but 2x the FLOPs

The round-2 probe (exp_stage1_convs.py) showed 64->128 dense reaches
110 TF/s vs 83 for 64->64 (+33% from full output lanes). If XLA lowers
B to something near that without doubling FLOPs, stage-1 (~8.65 ms of
the 22.3 ms embed) could shrink ~25%. If B lowers to a 2-iteration loop
of 64-channel convs (the common XLA grouped-conv strategy), it will
time the same as A and the idea is dead.

Timing: ≥20-call lax.scan chains (sub-10ms programs are not rankable
per-dispatch on the tunnel — docs/PERFORMANCE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(name, fn, x, inner=20, outer=3):
    def prog(x):
        def body(c, _):
            y = fn(c)
            # chain: next input depends on this output (axon elision)
            return c + (jnp.sum(y) * 0.0 + 1.0).astype(c.dtype), jnp.sum(y)

        cf, ss = jax.lax.scan(body, x, None, length=inner)
        return ss[-1], cf

    jfn = jax.jit(prog)
    try:
        s, xc = jfn(x)
        float(s)
        t0 = time.time()
        for _ in range(outer):
            s, xc = jfn(xc)
        float(s)
        dt = (time.time() - t0) / (outer * inner) * 1000.0
        print(f"{name}: {dt:7.3f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


def main():
    rng = np.random.default_rng(0)
    N2, H, W, C = 256, 112, 112, 64  # 256 crops, stage-1 geometry
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    dn = ("NHWC", "HWIO", "NHWC")

    xa = jnp.asarray(rng.normal(size=(N2, H, W, C)).astype(np.float32),
                     jnp.bfloat16)
    xb = xa.reshape(N2 // 2, 2, H, W, C).transpose(0, 2, 3, 1, 4).reshape(
        N2 // 2, H, W, 2 * C
    )

    def conv_a(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    wg = jnp.concatenate([w, w], axis=3)  # (3,3,64,128) grouped weights

    def conv_b(x):
        return jax.lax.conv_general_dilated(
            x, wg, (1, 1), "SAME", dimension_numbers=dn,
            feature_group_count=2,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    z = jnp.zeros_like(w)
    wbd = jnp.concatenate(
        [jnp.concatenate([w, z], 3), jnp.concatenate([z, w], 3)], 2
    )  # (3,3,128,128) block-diagonal

    def conv_c(x):
        return jax.lax.conv_general_dilated(
            x, wbd, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    print(f"device: {jax.devices()[0]}  {N2} crops of ({H},{W},{C})",
          flush=True)
    ta = timed("A baseline 2N x 64->64   ", conv_a, xa)
    tb = timed("B grouped  N x 128->128 g2", conv_b, xb)
    tc = timed("C blockdiag N x 128->128  ", conv_c, xb)
    if ta and tb:
        print(f"B/A {tb/ta:.3f}  C/A {(tc/ta if tc else float('nan')):.3f}",
              flush=True)

    # numeric check on tiny shapes (grouped must equal per-crop conv)
    xt = xa[:4]
    ya = np.asarray(jax.jit(conv_a)(xt), np.float32)
    xtb = xt.reshape(2, 2, H, W, C).transpose(0, 2, 3, 1, 4).reshape(2, H, W, 2 * C)
    yb = np.asarray(jax.jit(conv_b)(xtb), np.float32)
    yb_unpack = yb.reshape(2, H, W, 2, C).transpose(0, 3, 1, 2, 4).reshape(4, H, W, C)
    dev = np.abs(ya - yb_unpack).max()
    print(f"grouped-vs-baseline max dev: {dev:.5f}", flush=True)


if __name__ == "__main__":
    main()
