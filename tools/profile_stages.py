"""Per-stage wall-time breakdown of the fused pipeline on the real TPU.

Times each stage of pipeline/fused.frames_to_features as its own jitted
program with chained inputs + host-fetch sync (the only honest timing on
the tunneled axon backend — see bench.py). Run in the background with a
generous timeout; first compiles take minutes.

Usage: python tools/profile_stages.py [--batch 32] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.detect.decode import decode_outputs
    from facerecognizeonnx_tpu.detect.pipeline import postprocess
    from facerecognizeonnx_tpu.embed.pipeline import align_faces_batch, embed_crops
    from facerecognizeonnx_tpu.models import arcface, scrfd
    from facerecognizeonnx_tpu.ops.image import normalize_to_rgb
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    B, K = args.batch, 8
    on_tpu = not args.cpu and jax.devices()[0].platform != "cpu"
    cfg = PipelineConfig(warp_impl="pallas" if on_tpu else "gather")
    dtype = jnp.dtype(cfg.compute_dtype)

    det_params = init_on_host(
        lambda: scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(0)))
    )
    arc_params = init_on_host(
        lambda: arcface.fold_inference_params(arcface.init_params(jax.random.PRNGKey(1)))
    )

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (B, 640, 640, 3), dtype=np.uint8))
    kps = jnp.asarray(
        rng.uniform(100, 500, (B, K, 5, 2)).astype(np.float32)
    )
    boxes = jnp.concatenate(
        [kps.min(axis=2) - 20.0, kps.max(axis=2) + 20.0], axis=-1
    )
    crops = jnp.asarray(
        rng.integers(0, 256, (B * K, 112, 112, 3), dtype=np.uint8)
    )

    def timed(name, fn, x):
        jfn = jax.jit(fn)
        t0 = time.time()
        out, x2 = jfn(x)
        float(jnp.sum(out))
        print(f"{name:28s} compile+run {time.time() - t0:6.1f}s", flush=True)
        for _ in range(2):
            out, x2 = jfn(x2)
        float(jnp.sum(out))
        t0 = time.time()
        for _ in range(args.iters):
            out, x2 = jfn(x2)
        float(jnp.sum(out))
        dt = (time.time() - t0) / args.iters * 1000.0
        print(f"{name:28s} {dt:8.2f} ms/iter", flush=True)
        return dt

    def chain_u8(out_scalar, x):
        return x + (jnp.abs(out_scalar) * 0.0 + 1.0).astype(jnp.uint8)

    # 1. SCRFD forward only
    def scrfd_fwd(f):
        x = normalize_to_rgb(f, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
        outs = scrfd.apply(det_params, x, compute_dtype=dtype)
        s = sum(jnp.sum(v[0]) for v in outs.values())
        return s, chain_u8(s, f)

    # 2. SCRFD + decode + NMS (full detect)
    def detect_full(f):
        x = normalize_to_rgb(f, cfg.pixel_mean, cfg.pixel_scale, dtype=dtype)
        outs = scrfd.apply(det_params, x, compute_dtype=dtype)
        scores, bxs, kp = decode_outputs(outs, cfg.det_input_size, cfg.num_anchors)
        dets = jax.vmap(lambda s, b, k: postprocess(s, b, k, 1.0, cfg))(
            scores, bxs, kp
        )
        s = jnp.sum(dets.scores)
        return s, chain_u8(s, f)

    # 3. warp only (fixed landmarks)
    def warp_only(f):
        c = align_faces_batch(f, kps, boxes, cfg)
        s = jnp.sum(c.astype(jnp.float32))
        return s, chain_u8(s, f)

    # 4. embed only (B*K crops)
    def embed_only(c):
        feats = embed_crops(arc_params, c, cfg)
        s = jnp.sum(feats)
        return s, chain_u8(s, c)

    # 5. full fused
    def fused(f):
        dets, feats = frames_to_features(
            det_params, arc_params, f, cfg, max_faces_embed=K
        )
        s = jnp.sum(feats)
        return s, chain_u8(s, f)

    print(f"batch={B} K={K} device={jax.devices()[0]}", flush=True)
    t_fwd = timed("scrfd_fwd", scrfd_fwd, frames)
    t_det = timed("detect(fwd+decode+nms)", detect_full, frames)
    t_warp = timed("warp(align only)", warp_only, frames)
    t_embed = timed(f"embed({B * K} crops)", embed_only, crops)
    t_full = timed("fused full", fused, frames)
    print(
        f"\nsummary ms/batch{B}: fwd={t_fwd:.1f} +decode/nms={t_det - t_fwd:.1f} "
        f"warp={t_warp:.1f} embed={t_embed:.1f} | sum={t_det + t_warp + t_embed:.1f} "
        f"fused={t_full:.1f}"
    )


if __name__ == "__main__":
    main()
