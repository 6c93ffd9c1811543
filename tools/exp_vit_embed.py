"""Probe: ViT family embed throughput vs IResNet-50 / MobileFaceNet.

The ViT members (models/vit.py) are pure-GEMM recognizers — the shape
the MXU likes most. This measures scan-amortized device time for a
batch-256 embed forward (bf16, folded inference params) per family
member on the real chip, the same discipline as every other probe
(≥20-call chained scan; sub-10ms programs are not rankable
per-dispatch on the tunnel — docs/PERFORMANCE.md).

Decision input for whether a headline_vit bench config is worth
shipping: faces/sec here ≈ embed-stage ceiling; the fused pipeline adds
the (recognizer-independent) detect+warp cost in front.
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
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None


def main():
    from facerecognizeonnx_tpu.models import recognizer_module
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    B = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, 112, 112, 3)).astype(np.float32),
                    jnp.bfloat16)
    print(f"devices: {jax.devices()}", flush=True)

    for arch in ("iresnet50", "mbf", "vit_t", "vit_s", "vit_b"):
        mod = recognizer_module(arch)
        params = init_on_host(
            lambda: mod.fold_inference_params(
                mod.init_params(jax.random.PRNGKey(0), arch=arch)
            )
        )
        nmp = mod.num_params(params) / 1e6

        def fwd(v, _mod=mod, _p=params):
            return _mod.apply(_p, v, compute_dtype=jnp.bfloat16)

        dt = timed(arch, fwd, x)
        if dt is not None:
            print(
                f"{arch:10s}: {dt:7.3f} ms/{B} crops = "
                f"{B / dt * 1000:9.0f} faces/sec  ({nmp:.1f} M params)",
                flush=True,
            )


if __name__ == "__main__":
    main()
