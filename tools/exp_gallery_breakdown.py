"""Phase breakdown of the 1M-row 1:N search + candidate accelerations.

exp_gallery_1m.py established the 1M-row numbers of record (XLA
materialize 19.8k q/s, bf16-at-rest 21.4k) and the negative that bf16
helps only 1.08x -- "the search is not purely bank-read bound even at
2 GB". This probe answers WHAT the time actually goes to, then times
the candidate designs that target the dominant phase:

  phases  : matmul-only (f32 / bf16 / int8), top_k-only on a
            precomputed (Q, G) sims matrix, argmax-only (k=1 floor)
  designs : tiled two-stage top-k at 1M (the 100k negative may flip at
            10x rows), int8 stage-1 + exact f32 rescore of c candidates
            (ScaNN-style score-then-rescore), bf16 stage-1 + rescore

Rescore correctness note: stage-1 runs at reduced precision, takes
c >= 4k candidates per query, gathers ONLY those c rows (a tiny
(Q*c, D) gather -- the thing TPUs hate is per-element gather at bank
scale, not Q*c*D = 128*32*512 slices), rescores exact f32, re-top-ks.
Recall vs exact f32 is measured and printed alongside speed.

Timing: chained inner iterations inside one lax.scan program, host
fetch as sync (docs/PERFORMANCE.md measurement discipline).

Usage: python tools/exp_gallery_breakdown.py [--rows 1000000]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--outer", type=int, default=3)
    ap.add_argument("--topk", type=int, default=5)
    ap.add_argument("--cands", type=int, default=32)
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

    G = args.rows
    K = args.topk
    Q = 128
    D = 512
    print(f"device: {jax.devices()[0]}  rows={G:,}", file=sys.stderr)

    @jax.jit
    def make_bank(key):
        g = jax.random.normal(key, (G, D), jnp.float32)
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    g = make_bank(jax.random.PRNGKey(0))
    g16 = g.astype(jnp.bfloat16)

    # int8 bank: symmetric per-row scale (rows are L2-normalized, so
    # per-row max |v| ~ a few sigma/sqrt(D); scale preserves argmax order
    # approximately -- stage-1 only needs the top-c candidate SET right)
    @jax.jit
    def quantize_bank(b):
        scale = jnp.max(jnp.abs(b), axis=1, keepdims=True) / 127.0
        q8 = jnp.clip(jnp.round(b / scale), -127, 127).astype(jnp.int8)
        return q8, scale[:, 0]

    g8, g8_scale = quantize_bank(g)
    q0 = g[:Q]

    def chain(fn, q_init, *banks):
        """Chained scan: each iteration's query depends on the previous
        result so the backend cannot elide repeats."""
        def prog(q, *bs):
            def body(q, _):
                out = fn(q, *bs)
                s = out[0] if isinstance(out, tuple) else out
                return q + jnp.sum(s).astype(q.dtype) * 1e-12, jnp.sum(s)
            qf, ss = jax.lax.scan(body, q, None, length=args.inner)
            return ss[-1], qf
        jfn = jax.jit(prog)
        t0 = time.time()
        s, q = jfn(q_init, *banks)
        float(s)
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(args.outer):
            s, q = jfn(q, *banks)
        float(s)
        dt = time.time() - t0
        n = args.outer * args.inner
        return Q * n / dt, dt * 1e3 / n, compile_s

    results = {}

    def run(name, fn, *banks, q_init=None):
        try:
            qps, ms, comp = chain(fn, q0 if q_init is None else q_init, *banks)
            results[name] = {"qps": round(qps, 1), "ms_per_search": round(ms, 3)}
            print(f"{name}: {qps:,.0f} q/s  ({ms:.2f} ms/search; "
                  f"compile {comp:.0f}s)", file=sys.stderr)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name} FAILED: {str(e)[:300]}", file=sys.stderr)

    # ------------------------------------------------- phase isolation
    run("matmul_f32", lambda q, b: (q @ b.T,), g)
    run("matmul_bf16", lambda q, b: (q.astype(jnp.bfloat16) @ b.T,), g16)
    run("matmul_int8",
        lambda q, b, s: (
            jax.lax.dot_general(
                jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8),
                b,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ),
        ),
        g8, g8_scale)

    # top_k over a PRECOMPUTED sims matrix: isolates selection cost.
    sims0 = jax.jit(lambda q, b: q @ b.T)(q0, g)
    def topk_only(s_in, _b):
        s, i = jax.lax.top_k(s_in[:, :G], K)
        return s, i
    # chain() mutates its first arg; give it the sims matrix directly
    run("topk_only_on_sims", lambda s, b: topk_only(s, b), g, q_init=sims0)
    run("argmax_only_on_sims",
        lambda s, b: (jnp.max(s[:, :G], axis=1),), g, q_init=sims0)
    # byte-bound or algorithm-bound? top_k over bf16 sims halves the
    # selection bytes; if the time halves too, bf16-select + exact
    # rescore is the ~2x lever — if it doesn't, lax.top_k is
    # algorithm-bound and the lever dies.
    sims0_bf16 = sims0.astype(jnp.bfloat16)
    run("topk_only_on_sims_bf16",
        lambda s, b: (jax.lax.top_k(s[:, :G], K)[0].astype(jnp.float32),),
        g, q_init=sims0_bf16)

    # ------------------------------------------------- candidate designs
    from facerecognizeonnx_tpu.ops.pallas_gallery import (
        gallery_topk_reference,
        gallery_topk_tiled,
    )

    run("exact_xla", lambda q, b: gallery_topk_reference(q, b, K), g)
    run("tiled4096", lambda q, b: gallery_topk_tiled(q, b, K, tile=4096), g)

    def rescore(q, bank_lo, bank_f32, *, c, lo):
        """Stage-1 approx scores at low precision -> top-c candidate ids
        -> gather c rows -> exact f32 rescore -> top-k."""
        if lo == "bf16":
            s1 = jax.lax.dot_general(
                q.astype(jnp.bfloat16), bank_lo,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:  # int8
            q8 = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
            s1 = jax.lax.dot_general(
                q8, bank_lo, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        _cs, cid = jax.lax.top_k(s1, c)              # (Q, c)
        cand = bank_f32[cid]                          # (Q, c, D) slice gather
        s2 = jnp.einsum("qd,qcd->qc", q, cand)
        s2 = (s2 + 1.0) * 0.5
        sk, ik_local = jax.lax.top_k(s2, K)
        ik = jnp.take_along_axis(cid, ik_local, axis=1)
        return sk, ik

    run(f"rescore_bf16_c{args.cands}",
        functools.partial(rescore, c=args.cands, lo="bf16"), g16, g)
    run(f"rescore_int8_c{args.cands}",
        functools.partial(rescore, c=args.cands, lo="int8"), g8, g)

    def bf16_select(q, bank_f32, *, c):
        """Full-precision matmul, bf16 SIMS for the top-c selection
        (halves the selection read), exact f32 rescore of c candidates
        per query. Unlike `rescore(lo='bf16')` the stage-1 matmul is
        untouched — only the materialized sims and their top_k shrink."""
        s1 = (q @ bank_f32.T).astype(jnp.bfloat16)
        _cs, cid = jax.lax.top_k(s1, c)
        cand = bank_f32[cid]
        s2 = jnp.einsum("qd,qcd->qc", q, cand)
        s2 = (s2 + 1.0) * 0.5
        sk, ik_local = jax.lax.top_k(s2, K)
        return sk, jnp.take_along_axis(cid, ik_local, axis=1)

    run(f"bf16_select_c{max(K, 16)}",
        functools.partial(bf16_select, c=max(K, 16)), g)

    # ------------------------------------------------- recall check
    try:
        s_ex, i_ex = jax.jit(
            lambda q, b: gallery_topk_reference(q, b, K))(q0, g)
        i_ex = np.asarray(i_ex)
        def recall_of(name, i_rs):
            i_rs = np.asarray(i_rs)
            hit = np.mean([
                len(set(i_ex[r]) & set(i_rs[r])) / K for r in range(Q)
            ])
            results[f"recall@{K}_{name}"] = round(float(hit), 4)
            print(f"recall@{K} {name}: {hit:.4f}", file=sys.stderr)

        for lo, bank in (("bf16", g16), ("int8", g8)):
            _s, i_rs = jax.jit(
                functools.partial(rescore, c=args.cands, lo=lo))(q0, bank, g)
            recall_of(f"rescore_{lo}_c{args.cands}", i_rs)
        _s, i_bs = jax.jit(
            functools.partial(bf16_select, c=max(K, 16)))(q0, g)
        recall_of(f"bf16_select_c{max(K, 16)}", i_bs)
    except Exception as e:
        print(f"recall check FAILED: {str(e)[:300]}", file=sys.stderr)

    print(json.dumps({"rows": G, "q": Q, "topk": K, "cands": args.cands,
                      "configs": results}))


if __name__ == "__main__":
    main()
