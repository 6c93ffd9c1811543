"""1:N identification service demo (micro-batching + gallery search).

Shows the serving surface: enroll a gallery of identities, start the
micro-batching IdentifyService (concurrent callers coalesce into one
fused device program per window), fire concurrent queries, print
per-request results and service stats. The reference's closest analog
is the webcam loop's enroll-then-match flow (reference
src/main.cpp:214-257) — one face, one image, one thread there.

Usage:
  python examples/serve_identify.py [--cpu] [--people 32] [--queries 16] \
      [--rec-arch iresnet50|mbf] [--sharded]
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--people", type=int, default=32)
    ap.add_argument("--queries", type=int, default=16)
    ap.add_argument("--rec-arch", default="iresnet50")
    ap.add_argument("--sharded", action="store_true",
                    help="shard the gallery over the device mesh")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from facerecognizeonnx_tpu.config import auto_config
    from facerecognizeonnx_tpu.match.gallery import GalleryBank
    from facerecognizeonnx_tpu.models import recognizer_module, scrfd
    from facerecognizeonnx_tpu.pipeline.service import IdentifyService
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    cfg = auto_config(
        compute_dtype="float32" if args.cpu else "bfloat16",
        rec_arch=args.rec_arch,
    )
    det = init_on_host(lambda: scrfd.init_params(jax.random.PRNGKey(0)))
    arch_mod = recognizer_module(cfg.rec_arch)
    rec = init_on_host(
        lambda: arch_mod.init_params(jax.random.PRNGKey(1), arch=cfg.rec_arch)
    )

    rng = np.random.default_rng(0)
    bank = GalleryBank(feature_dim=cfg.feature_dim)
    feats = rng.normal(size=(args.people, cfg.feature_dim)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    bank.add_batch([f"person{i:03d}" for i in range(args.people)], feats)
    print(f"gallery: {len(bank)} identities")

    # direct 1:N search (optionally sharded over the device mesh)
    names, sims = bank.search(feats[:2], top_k=1, sharded=args.sharded)
    print(f"self-search sanity: {names[0][0]} @ {sims[0, 0]:.3f}, "
          f"{names[1][0]} @ {sims[1, 0]:.3f} (sharded={args.sharded})")

    svc = IdentifyService(det, rec, bank, cfg, max_batch=8, batch_window_ms=25)
    try:
        imgs = [
            rng.integers(0, 256, (240, 320, 3), dtype=np.uint8)
            for _ in range(args.queries)
        ]
        svc.identify(imgs[0])  # warm compile off the clock

        results = [None] * args.queries
        t0 = time.time()
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, svc.identify(imgs[i], top_k=3, timeout=600)
                )
            )
            for i in range(args.queries)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.time() - t0

        for i, res in enumerate(results[:4]):
            k = int(res.valid.sum())
            top = res.names[0][0] if k else "-"
            print(f"query {i}: {k} faces, top match: {top}")
        stats = svc.stats()
        print(
            f"{args.queries} concurrent queries in {dt:.2f}s — "
            f"batches={stats['batches']} avg_batch={stats['avg_batch']:.1f}"
        )
    finally:
        svc.close()


if __name__ == "__main__":
    main()
