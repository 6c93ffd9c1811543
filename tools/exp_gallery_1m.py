"""Capacity probe: 1:N search at 1,000,000 gallery rows on one v5e chip.

The bench config of record measures 100k rows (BASELINE.json config 5).
This experiment scales the bank 10x to the production-scale regime and
times the three implementations at Q=128, top-5:

- XLA materialize+top_k (the <= ~2G-similarity fast path): at 1M rows a
  (128, 1M) f32 similarity matrix is 512 MB — still materializable, so
  XLA remains eligible; the question is whether it holds its bandwidth-
  floor behavior (2 GB gallery read/search ≈ 13.1 µs/query at 800 GB/s).
- streaming Pallas kernel (ops/pallas_gallery.py): never materializes
  (Q, G); the regime it exists for.
- bf16 at-rest bank: halves the stream to 1 GB — the capacity option
  (match/gallery.py storage_dtype) at the scale where it matters.

Timing discipline: INNER chained searches inside ONE program
(lax.scan), host fetch as the sync — per docs/PERFORMANCE.md.

Usage: python tools/exp_gallery_1m.py [--rows 1000000] [--inner 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--outer", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from facerecognizeonnx_tpu.ops.pallas_gallery import (
        gallery_topk_pallas,
        gallery_topk_reference,
    )

    g_rows = args.rows
    print(f"device: {jax.devices()[0]}  rows={g_rows:,}", file=sys.stderr)

    # build the bank ON DEVICE (a 2 GB host upload over the tunnel would
    # take minutes): normalized pseudo-random rows from a jitted program
    @jax.jit
    def make_bank(key):
        g = jax.random.normal(key, (g_rows, 512), jnp.float32)
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    g = make_bank(jax.random.PRNGKey(0))
    g16 = g.astype(jnp.bfloat16)
    q0 = g[:128]

    results = {}
    for name, fn, bank in (
        ("xla_materialize",
         lambda q, b: gallery_topk_reference(q, b, 5), g),
        ("xla_bf16_at_rest",
         lambda q, b: gallery_topk_reference(q.astype(jnp.bfloat16), b, 5),
         g16),
        ("pallas_stream",
         lambda q, b: gallery_topk_pallas(q, b, 5), g),
        ("pallas_stream_bf16",
         lambda q, b: gallery_topk_pallas(q.astype(jnp.bfloat16), b, 5),
         g16),
    ):
        try:
            # the bank MUST be a jit argument, not a closure capture — a
            # closed-over 2 GB device array becomes a lowered-module
            # constant (2 GB duplicated in HBM + minutes of lowering)
            def prog(q, b, f=fn):
                def body(q, _):
                    s, _i = f(q, b)
                    return q + jnp.sum(s).astype(q.dtype) * 1e-12, jnp.sum(s)
                qf, ss = jax.lax.scan(body, q, None, length=args.inner)
                return ss[-1], qf

            jfn = jax.jit(prog)
            t0 = time.time()
            s, q = jfn(q0, bank)
            float(s)
            print(f"{name}: compile+first {time.time() - t0:.1f}s",
                  file=sys.stderr)
            t0 = time.time()
            for _ in range(args.outer):
                s, q = jfn(q, bank)
            float(s)
            dt = time.time() - t0
            qps = 128 * args.outer * args.inner / dt
            ms_per_search = dt * 1e3 / (args.outer * args.inner)
            results[name] = (qps, ms_per_search)
            print(f"{name}: {qps:,.0f} q/s  ({ms_per_search:.2f} ms/search "
                  f"of 128 queries)", file=sys.stderr)
        except Exception as e:
            print(f"{name} FAILED: {str(e)[:300]}", file=sys.stderr)

    import json

    print(json.dumps({
        "rows": g_rows,
        "configs": {k: {"qps": round(v[0], 1), "ms_per_search": round(v[1], 3)}
                    for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
