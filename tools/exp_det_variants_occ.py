"""Detector-variant probe at the production-point composition (round 5).

Times PROGRAM A of the occupancy-adaptive pipeline (detect + decode +
NMS + align/warp + valid-first compaction, pipeline/bucketed.py) for
each shipped SCRFD variant at batch 128 / 2-of-8 forced occupancy —
the exact front half of the `headline_occ_adaptive*` bench configs.

Result (v5e, 2026-08-20, recorded in docs/PERFORMANCE.md round-5
section): 500m 41.6 ms, dense "tpu" 45.3 ms, 500m_s2d 40.7 ms per
step — no variant beats the default, so ~41 ms is the program-A floor
with the shipped detector family and adaptive x mbf sits at ~95% of
the resulting ceiling.

Honest-timing rules apply (docs/PERFORMANCE.md measurement
discipline): cross-program chain with the value-dependent
`1 + |sum|*1e-38` bump, final host fetch as the sync.

Usage: PYTHONPATH=.:/root/.axon_site python tools/exp_det_variants_occ.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from facerecognizeonnx_tpu.config import PipelineConfig
from facerecognizeonnx_tpu.models import scrfd
from facerecognizeonnx_tpu.pipeline.bucketed import detect_and_compact
from facerecognizeonnx_tpu.utils.hostinit import init_on_host


def main():
    B = 128
    rng = np.random.default_rng(0)
    frames0 = jnp.asarray(
        rng.integers(0, 256, (B, 640, 640, 3), dtype=np.uint8)
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    for variant in ("500m", "tpu", "500m_s2d"):
        cfg = PipelineConfig(
            warp_impl="pallas" if on_tpu else "gather",
            skip_invalid_faces=True, scrfd_variant=variant,
        )
        det = init_on_host(
            lambda v=variant: scrfd.fold_inference_params(
                scrfd.init_params(jax.random.PRNGKey(0), variant=v)
            )
        )
        prog = jax.jit(
            lambda fr: detect_and_compact(det, fr, cfg, 8, None, 2)
        )

        @jax.jit
        def chain(fr, c):
            tiny = jnp.sum(c).astype(jnp.float32) * 1e-38
            return fr + (1.0 + jnp.abs(tiny)).astype(jnp.uint8)

        fr = frames0
        t0 = time.time()
        _d, cc, _p, _v, c = prog(fr)
        fr = chain(fr, c)
        float(jnp.sum(c))
        print(f"{variant}: compile+first {time.time() - t0:.0f}s")
        t0 = time.time()
        for _ in range(10):
            _d, cc, _p, _v, c = prog(fr)
            fr = chain(fr, c)
        float(jnp.sum(c))
        print(f"{variant}: program A {100 * (time.time() - t0):.1f} ms/step")


if __name__ == "__main__":
    main()
