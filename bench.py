"""End-to-end TPU benchmark — prints ONE JSON line.

Headline metric (BASELINE.json): faces/sec/chip end-to-end
(detect + align + embed), target ≥5000 on a TPU v5e chip. The measured
program is pipeline/fused.frames_to_features: a batch of letterboxed
640x640 frames → SCRFD detect → decode → NMS → align → ArcFace embed,
one XLA program, K=8 faces embedded per frame (all K slots are computed
whether or not a real face occupies them, so the number is honest about
the full align+embed cost).

By default ALL TEN configs run (headline, headline_mbf, headline_q8,
headline_onnx, headline_occ, headline_occ_adaptive, latency, enroll,
gallery, video); the
FINAL stdout line is a compact (<1 KB) summary with every config's
value (the driver's tail capture is ~2,000 bytes — VERDICT r3 item 1),
preceded by the full detail document (also written to
bench_detail.json). Latency percentiles are TRUE percentiles over ≥20
per-step wall-time samples with a host fetch per step.

Usage: python bench.py [--batch B] [--iters N] [--cpu] [--json-only]
                       [--config headline|enroll|gallery|video|all]
"""

import argparse
import functools
import json
import sys
import threading
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TARGET_FACES_PER_SEC = 5000.0  # BASELINE.md build target
FACES_PER_FRAME = 8

# Watchdog knobs: a bench process whose remote compile/execute RPC is
# lost sleeps FOREVER mid-config (observed once after a tunnel load
# spike — docs/ROADMAP.md "fifth session" note). The recovery that
# worked was starting a FRESH process, which rode the persistent
# compile cache through the same config in seconds. The watchdog
# automates that: per-config deadline -> re-exec with the completed
# results saved, bounded attempts per config and re-execs per run.
CONFIG_DEADLINE_S = float(os.environ.get("FRT_BENCH_CONFIG_DEADLINE_S", "1500"))
MAX_REEXECS = int(os.environ.get("FRT_BENCH_MAX_REEXECS", "6"))
MAX_ATTEMPTS_PER_CONFIG = 2


def _load_state(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {"results": {}, "attempts": {}, "reexecs": 0}


def _save_state(path, state):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)


def _emit_final(results, order):
    """Emit the results. The driver captures only the LAST ~2,000 bytes
    of stdout and parses the final line — round 3 lost its numbers of
    record because the single JSON document outgrew that window
    (BENCH_r03 "parsed": null). So: the FULL detail document goes to
    bench_detail.json and an earlier stdout line; the FINAL stdout line
    is a compact (<1 KB) summary carrying every config's headline value.
    Must succeed even when the headline config itself errored/timed out."""
    head = results.get("headline")
    if not (isinstance(head, dict) and "value" in head):
        head = {
            "metric": "faces/sec/chip end-to-end (detect+align+embed)",
            "value": 0.0, "unit": "faces/sec", "vs_baseline": 0.0,
            "detail": {"error": (head or {}).get("error", "headline missing")},
        }
    full = dict(head)
    full["detail"] = dict(head.get("detail", {}))
    full["detail"]["configs"] = {
        k: v for k, v in results.items() if k != "headline" and k in order
    }
    if results.get("_hbm_gbps") is not None:
        # chip-health context: compare against ~600+ GB/s on an
        # uncontended v5e; a low number marks a shared/degraded chip
        full["detail"]["hbm_read_gbps"] = results["_hbm_gbps"]
    detail_file = None
    try:
        detail_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"
        )
        with open(detail_path, "w") as f:
            json.dump(full, f, indent=1)
        detail_file = os.path.basename(detail_path)
    except OSError:
        pass
    print(json.dumps(full))  # full document, line BEFORE the line of record

    compact = {
        "metric": head["metric"],
        "value": head["value"],
        "unit": head["unit"],
        "vs_baseline": head["vs_baseline"],
        "detail": {"configs": {}},
    }
    for k in order:
        v = results.get(k)
        if k == "headline" or v is None:
            continue
        if isinstance(v, dict) and "value" in v:
            compact["detail"]["configs"][k] = {
                "value": v["value"], "unit": v["unit"],
                "vs_baseline": v["vs_baseline"],
            }
        else:
            compact["detail"]["configs"][k] = {
                "error": str((v or {}).get("error", "?"))[:60]
            }
    if results.get("_hbm_gbps") is not None:
        compact["detail"]["hbm_read_gbps"] = results["_hbm_gbps"]
    if detail_file:
        compact["detail"]["detail_file"] = detail_file
    line = json.dumps(compact)
    if len(line) > 1900:  # never outgrow the driver's tail window again
        compact["detail"] = {
            "configs": (
                "truncated, see " + detail_file
                if detail_file
                else "truncated (detail file unwritable)"
            )
        }
        # keep the chip-health annotation even in the degraded line
        if results.get("_hbm_gbps") is not None:
            compact["detail"]["hbm_read_gbps"] = results["_hbm_gbps"]
        line = json.dumps(compact)
    print(line)
    sys.stdout.flush()


class _Watchdog:
    """Per-config deadline. armed() around each runner; on expiry the
    watchdog thread either re-execs a fresh bench process resuming from
    the state file (the wedged RPC thread dies with the old image), or —
    re-exec budget exhausted — emits the partial results JSON itself and
    exits, so the driver always gets a parseable line."""

    def __init__(self, state_path, state, order, deadline_s=CONFIG_DEADLINE_S):
        self.state_path = state_path
        self.state = state
        self.order = order
        self.deadline_s = deadline_s
        self._cancel = None

    def arm(self, name):
        self.disarm()
        ev = threading.Event()
        self._cancel = ev
        t = threading.Timer(self.deadline_s, self._expire, (name, ev))
        t.daemon = True
        t.start()
        self._timer = t

    def disarm(self):
        if self._cancel is not None:
            self._cancel.set()
            self._timer.cancel()
            self._cancel = None

    def _expire(self, name, ev):
        if ev.is_set():
            return
        print(
            f"WATCHDOG: config '{name}' exceeded {self.deadline_s:.0f}s "
            f"(attempt {self.state['attempts'].get(name, '?')}); ",
            file=sys.stderr, end="",
        )
        if self.state.get("reexecs", 0) >= MAX_REEXECS:
            print("re-exec budget exhausted — emitting partial results",
                  file=sys.stderr)
            self.state["results"].setdefault(
                name, {"error": f"timed out after {self.deadline_s:.0f}s"}
            )
            _emit_final(self.state["results"], self.order)
            os._exit(0)
        print("re-exec with saved results", file=sys.stderr)
        sys.stderr.flush()
        argv = [a for a in sys.argv if not a.startswith("--_state")]
        os.execv(
            sys.executable,
            [sys.executable] + argv + [f"--_state={self.state_path}"],
        )


def _percentiles(samples_s):
    import numpy as np

    ms = np.asarray(samples_s) * 1000.0
    return {
        "samples": len(ms),
        "p50_ms": round(float(np.percentile(ms, 50)), 2),
        "p90_ms": round(float(np.percentile(ms, 90)), 2),
        "p99_ms": round(float(np.percentile(ms, 99)), 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batch", type=int, default=None,
        help="frames per step (default: 128 on TPU — best measured once "
        "the warp kernel's merged SMEM table made it compilable; 2 on CPU)",
    )
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument(
        "--config",
        default="all",
        choices=[
            "headline", "headline_mbf", "headline_q8", "headline_mbf_q8",
            "headline_onnx", "headline_occ", "headline_occ_adaptive",
            "headline_occ_adaptive_mbf", "headline_occ_adaptive_q8",
            "serve", "latency", "enroll", "gallery", "video", "all",
            "selftest",
        ],
        help="BASELINE.json config to run; 'all' (default) runs twelve "
        "(headline, headline_mbf, headline_q8, headline_onnx, "
        "headline_occ, headline_occ_adaptive, headline_occ_adaptive_mbf, "
        "serve, latency, enroll, gallery, video) and reports headline as "
        "the top-level metric",
    )
    ap.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the selected config's "
        "timed region into DIR (view with TensorBoard/Perfetto); "
        "single-config runs only. NOTE: the tunneled axon backend "
        "returns host-side timelines only — device op timelines need "
        "a PCIe-attached TPU host",
    )
    ap.add_argument(
        "--_init-retries", type=int, default=int(os.environ.get(
            "FRT_BENCH_INIT_RETRIES", "2")), help=argparse.SUPPRESS,
    )
    ap.add_argument("--_state", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    # Watchdog resume state (see _Watchdog). Created on first run so the
    # re-exec'd process finds completed configs and attempt counts.
    if args._state is None:
        import tempfile

        fd, args._state = tempfile.mkstemp(prefix="frt_bench_", suffix=".json")
        os.close(fd)
        sys.argv.append(f"--_state={args._state}")
    state = _load_state(args._state)
    state["reexecs"] = state.get("reexecs", 0) + (1 if state["results"] or state["attempts"] else 0)

    if args.config == "selftest":
        # Watchdog plumbing check, no jax: hangs on the first attempt
        # when FRT_BENCH_TEST_HANG is set, succeeds on the retry.
        name = "selftest"
        wd = _Watchdog(args._state, state, [name])
        attempt = state["attempts"].get(name, 0)
        state["attempts"][name] = attempt + 1
        _save_state(args._state, state)
        wd.arm(name)
        if os.environ.get("FRT_BENCH_TEST_HANG") and attempt == 0:
            while True:
                time.sleep(3600)
        wd.disarm()
        print(json.dumps({
            "metric": "bench watchdog selftest", "value": 1.0, "unit": "ok",
            "vs_baseline": None, "detail": {"attempt": attempt,
                                            "reexecs": state["reexecs"]},
        }))
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        # The tunneled TPU backend (axon) intermittently fails init with
        # UNAVAILABLE (observed outages of hours). A failed init poisons
        # the in-process backend cache, so retry by RE-EXEC: fresh
        # process, bounded attempts, so a transient outage doesn't cost
        # the driver its round-end number.
        try:
            jax.devices()
        except RuntimeError as e:
            if args._init_retries <= 0:
                raise
            print(
                f"backend init failed ({str(e)[:120]}); "
                f"{args._init_retries} retries left, sleeping 300s",
                file=sys.stderr,
            )
            time.sleep(300)
            argv = [a for a in sys.argv if not a.startswith("--_init-retries")]
            os.execv(
                sys.executable,
                [sys.executable] + argv
                + [f"--_init-retries={args._init_retries - 1}"],
            )
    # remote-compile round trips cost minutes; persist compiled programs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.config import PipelineConfig
    from facerecognizeonnx_tpu.models import arcface, scrfd
    from facerecognizeonnx_tpu.utils.hostinit import init_on_host

    def log(*a):
        if not args.json_only:
            print(*a, file=sys.stderr)

    on_tpu = not args.cpu and jax.devices()[0].platform != "cpu"
    batch_was_default = args.batch is None
    if args.batch is None:
        args.batch = 128 if on_tpu else 2
    # skip_invalid_faces=False: the headline pays for ALL K face slots
    # whether or not a detection occupies them (synthetic frames have
    # arbitrary detections — skipping would make the number dishonest)
    cfg = PipelineConfig(
        warp_impl="pallas" if on_tpu else "gather",  # bf16 compute
        skip_invalid_faces=False,
    )
    log(f"device: {jax.devices()[0]} warp={cfg.warp_impl} batch={args.batch}")

    t0 = time.time()
    det_params = init_on_host(
        lambda: scrfd.fold_inference_params(scrfd.init_params(jax.random.PRNGKey(0)))
    )
    arc_params = init_on_host(
        lambda: arcface.fold_inference_params(arcface.init_params(jax.random.PRNGKey(1)))
    )
    log(f"init {time.time() - t0:.1f}s")

    def bench_headline_mbf():
        """Same fused pipeline with the w600k_mbf-class recognizer
        (models/mobilefacenet.py) — the fast buffalo_s/sc family member;
        labeled separately, never the headline metric."""
        out = bench_headline(args, cfg, det_params, _mbf_params(), log)
        out["metric"] = "faces/sec/chip end-to-end (detect+align+mbf embed)"
        return out

    def bench_headline_q8():
        """Fused pipeline with the w8a8-quantized r50 recognizer
        (models/quant.py): int8 MXU convs at 2x bf16 peak + half the
        activation HBM traffic. Optional deployment config — the bf16
        headline stays the parity-bearing metric."""
        out = bench_headline(args, cfg, det_params, _q8_recognizer(), log)
        out["metric"] = "faces/sec/chip end-to-end (detect+align+int8 embed)"
        return out

    def bench_headline_mbf_q8():
        """mbf recognizer + selective int8: the two fast options compose
        (mbf's 128-512-wide expand convs are exactly where v5e int8
        wins; its depthwise convs stay bf16 via the groups!=1 rule)."""
        from facerecognizeonnx_tpu.models import mobilefacenet as mbf
        from facerecognizeonnx_tpu.models import quant

        mbf_params = _mbf_params()
        rng = np.random.default_rng(4)
        calib = jnp.asarray(
            (rng.integers(0, 256, (64, 112, 112, 3)).astype(np.float32) - 127.5)
            / 128.0
        )
        qstate = jax.jit(
            lambda p, c: quant.quantize_recognizer(
                mbf.apply, p, c, min_channels=128
            )
        )(mbf_params, calib)
        rec = quant.QuantizedRecognizer(mbf.apply, mbf_params, qstate)
        out = bench_headline(args, cfg, det_params, rec, log)
        out["metric"] = "faces/sec/chip end-to-end (detect+align+int8 mbf embed)"
        return out

    def bench_headline_onnx():
        """Fused pipeline with BOTH models loaded FROM .onnx FILES — the
        reference's actual deployment shape (src/main.cpp:269-284 loads
        det_500m.onnx + w600k_r50.onnx). The detector takes OnnxRunner's
        NHWC fast path (executor.py — native_map claims no detector
        topologies); the recognizer takes the native-map fast path
        (map_recognizer transplants the .onnx weights onto the native
        NHWC model and numerically self-verifies — the same route
        FaceRecognizer.load_model gives a real w600k_r50.onnx). Measures
        the full from-.onnx deployment vs the native headline on
        identical weights/topologies (round-trip through onnx_export)."""
        import tempfile

        from facerecognizeonnx_tpu.models import arcface as arc_mod
        from facerecognizeonnx_tpu.models import scrfd as scrfd_mod
        from facerecognizeonnx_tpu.onnx_export import (
            export_detector,
            export_recognizer,
        )
        from facerecognizeonnx_tpu.onnx_import import OnnxRunner
        from facerecognizeonnx_tpu.onnx_import.native_map import map_recognizer

        det_unfolded = init_on_host(
            lambda: scrfd_mod.init_params(jax.random.PRNGKey(0))
        )
        arc_unfolded = init_on_host(
            lambda: arc_mod.init_params(jax.random.PRNGKey(1))
        )
        with tempfile.TemporaryDirectory() as d:
            dpath = os.path.join(d, "det_500m_rt.onnx")
            rpath = os.path.join(d, "w600k_r50_rt.onnx")
            export_detector(jax.device_get(det_unfolded), path=dpath)
            export_recognizer(jax.device_get(arc_unfolded), path=rpath)
            runner = OnnxRunner(dpath)
            mapped = map_recognizer(rpath, "iresnet50")
            if mapped is None:
                raise RuntimeError(
                    "native_map rejected the exported w600k_r50-shaped "
                    ".onnx — the deployment fast path regressed"
                )
            rec_params = arc_mod.fold_inference_params(mapped)
        out = bench_headline(args, cfg, runner, rec_params, log)
        out["metric"] = (
            "faces/sec/chip end-to-end (both models from .onnx: "
            "executor detect + native-mapped embed)"
        )
        return out

    def bench_headline_occ():
        """Production-default occupancy path (VERDICT r3 item 4): the
        config.py default skip_invalid_faces=True with 2 of the K=8
        embed slots occupied — the realistic webcam/video operating
        point users actually see (the honest all-slots headline pays
        for every slot). The warp kernel's valid-skip A/B predicts
        ~0.70x warp time at 2/8 (ops/warp_pallas.py); this measures the
        end-to-end effect. Occupancy is forced via frames_to_features'
        valid_cap bench control because synthetic frames produce
        arbitrary detections. faces/sec counts the 2 real faces."""
        import dataclasses

        # replace() so every OTHER field of the bench's base config is
        # inherited — rebuilding from defaults would silently diverge
        # from the headline it A/Bs against if main() ever adds another
        # override
        cfg_occ = dataclasses.replace(cfg, skip_invalid_faces=True)
        out = bench_headline(args, cfg_occ, det_params, arc_params, log,
                             valid_cap=2)
        out["metric"] = (
            "faces/sec/chip end-to-end, 2/8 occupancy "
            "(production-default valid-skip)"
        )
        return out

    def _mbf_params():
        from facerecognizeonnx_tpu.models import mobilefacenet as mbf

        return init_on_host(
            lambda: mbf.fold_inference_params(mbf.init_params(jax.random.PRNGKey(2)))
        )

    def _q8_recognizer():
        """Selective int8 r50 (min_channels=128: only the wide convs
        where v5e int8 measures faster than bf16, tools/exp_int8_conv.py);
        calibration is ONE jitted program (eager would be ~110 tunnel
        round-trips). Shared by headline_q8 and the adaptive composite."""
        from facerecognizeonnx_tpu.models import quant

        rng = np.random.default_rng(3)
        calib = jnp.asarray(
            (rng.integers(0, 256, (64, 112, 112, 3)).astype(np.float32) - 127.5)
            / 128.0
        )
        qstate = jax.jit(
            lambda p, c: quant.quantize_recognizer(
                arcface.apply, p, c, min_channels=128
            )
        )(arc_params, calib)
        return quant.QuantizedRecognizer(arcface.apply, arc_params, qstate)

    def bench_occ_adaptive_mbf():
        """The production-point composition (VERDICT r4 item 2):
        occupancy-adaptive bucketed embed x the mbf recognizer at 2/8
        occupancy — the candidate number of record for crossing the
        5,000 valid-faces/sec target at the production operating
        point (adaptive alone 0.73x, mbf alone 1.52x of the dense
        full-occupancy target)."""
        return bench_occ_adaptive(
            args, cfg, det_params, _mbf_params(), log, label=" x mbf"
        )

    def bench_occ_adaptive_q8():
        """adaptive x selective-int8 r50 composition at 2/8 occupancy
        (available by name; the mbf composition is the 'all' config)."""
        return bench_occ_adaptive(
            args, cfg, det_params, _q8_recognizer(), log, label=" x int8 r50"
        )

    def headline_resilient():
        """Headline at the default batch 128, falling back to 64 if the
        large-batch program fails (the batch-64 operating point is the
        round-2 proven one; the driver's number of record must survive a
        flaky large-batch compile/tunnel rather than report nothing)."""
        try:
            return bench_headline(args, cfg, det_params, arc_params, log)
        except Exception as e:
            if not (batch_was_default and args.batch > 64):
                raise
            log(f"headline at batch {args.batch} FAILED ({e}); retry at 64")
            import copy

            args64 = copy.copy(args)
            args64.batch = 64
            return bench_headline(args64, cfg, det_params, arc_params, log)

    runners = {
        "headline": headline_resilient,
        "headline_onnx": bench_headline_onnx,
        "headline_occ": bench_headline_occ,
        "headline_occ_adaptive": lambda: bench_occ_adaptive(
            args, cfg, det_params, arc_params, log, stage_split=True
        ),
        "headline_occ_adaptive_mbf": bench_occ_adaptive_mbf,
        "headline_occ_adaptive_q8": bench_occ_adaptive_q8,
        "serve": lambda: bench_serve(args, cfg, det_params, arc_params, log),
        "headline_mbf": bench_headline_mbf,
        "headline_q8": bench_headline_q8,
        "headline_mbf_q8": bench_headline_mbf_q8,
        "latency": lambda: bench_latency(args, cfg, det_params, arc_params, log),
        "enroll": lambda: bench_enroll(args, cfg, arc_params, log),
        "gallery": lambda: bench_gallery(args, log),
        "video": lambda: bench_video(args, cfg, det_params, arc_params, log),
    }
    if args.config != "all":
        wd = _Watchdog(args._state, state, [args.config])
        state["attempts"][args.config] = state["attempts"].get(args.config, 0) + 1
        _save_state(args._state, state)
        wd.arm(args.config)
        if args.profile:
            # trace ONLY the selected config (compiles included — the
            # steady-state steps are the tail of the trace)
            with jax.profiler.trace(args.profile):
                out = runners[args.config]()
            wd.disarm()
            log(f"profiler trace written to {args.profile}")
            print(json.dumps(out))
            return
        out = runners[args.config]()
        wd.disarm()
        print(json.dumps(out))
        return
    if args.profile:
        log("--profile needs a single --config; ignoring for 'all'")

    # headline_mbf_q8 is available but NOT in "all": measured 7,295 vs
    # 7,283 bf16-mbf — at mbf's FLOP count the pipeline is warp+detector
    # bound, so int8 embed moves nothing (it remains the 4x-smaller-
    # weights deployment point).
    # headline_occ_adaptive_q8 is available by name but NOT in "all":
    # at the 2/8 bucket the step is detect/warp-bound, so the int8
    # composition tracks the mbf one without adding information (and
    # each extra config costs the driver's bench window).
    order = [
        "headline", "headline_mbf", "headline_q8", "headline_onnx",
        "headline_occ", "headline_occ_adaptive",
        "headline_occ_adaptive_mbf", "serve", "latency", "enroll",
        "gallery", "video",
    ]
    results = state["results"]
    if results:
        log(f"resuming: {sorted(results)} already done "
            f"(re-exec {state['reexecs']}/{MAX_REEXECS})")
    wd = _Watchdog(args._state, state, order)
    for name in order:
        if name in results:
            continue
        attempt = state["attempts"].get(name, 0)
        if attempt >= MAX_ATTEMPTS_PER_CONFIG:
            results[name] = {
                "error": f"timed out (watchdog, {attempt} attempts)"
            }
            _save_state(args._state, state)
            log(f"{name} SKIPPED after {attempt} timed-out attempts")
            continue
        state["attempts"][name] = attempt + 1
        _save_state(args._state, state)
        t0 = time.time()
        wd.arm(name)
        try:
            results[name] = runners[name]()
        except Exception as e:  # one config must not sink the whole bench
            log(f"{name} FAILED: {e}")
            results[name] = {"error": str(e)[:300]}
        wd.disarm()
        _save_state(args._state, state)
        log(f"{name} done in {time.time() - t0:.1f}s")

    results["_hbm_gbps"] = _probe_hbm_gbps(log)
    log(f"hbm probe: {results['_hbm_gbps']} GB/s")
    _save_state(args._state, state)
    _emit_final(results, order)
    try:
        os.unlink(args._state)
    except OSError:
        pass


def bench_headline(args, cfg, det_params, arc_params, log, valid_cap=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    @jax.jit
    def step(frames):
        dets, feats = frames_to_features(
            det_params, arc_params, frames, cfg,
            max_faces_embed=FACES_PER_FRAME, valid_cap=valid_cap,
        )
        # Chain the next input on this step's output: every iteration is
        # data-dependent on the previous one, so no runtime layer can
        # elide/replay repeated identical calls (the axon client caches
        # identical (executable, args) executions otherwise).
        bump = (jnp.abs(jnp.sum(feats)) * 0.0 + 1.0).astype(jnp.uint8)
        return feats, frames + bump

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 640, 640, 3), dtype=np.uint8)
    )

    # NOTE: block_until_ready is not a reliable sync on the tunneled axon
    # backend (fire-ahead execution) — a host fetch is. Combined with the
    # input chaining above, fetching the last output bounds the full
    # sequential chain of real executions.
    t0 = time.time()
    feats, frames = step(frames)
    float(jnp.sum(feats))
    log(f"compile+first run {time.time() - t0:.1f}s")
    for _ in range(2):
        feats, frames = step(frames)
    float(jnp.sum(feats))

    t0 = time.time()
    for _ in range(args.iters):
        feats, frames = step(frames)
    float(jnp.sum(feats))  # host fetch = true sync
    dt = time.time() - t0

    # latency: per-step wall times with a host fetch per step (true
    # percentiles; includes the tunnel round-trip, so it upper-bounds
    # on-device step latency)
    samples = []
    for _ in range(max(20, args.iters)):
        t1 = time.time()
        feats, frames = step(frames)
        float(jnp.sum(feats))
        samples.append(time.time() - t1)

    frames_per_sec = args.batch * args.iters / dt
    faces = FACES_PER_FRAME if valid_cap is None else valid_cap
    faces_per_sec = frames_per_sec * faces
    return {
        "metric": "faces/sec/chip end-to-end (detect+align+embed)",
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / TARGET_FACES_PER_SEC, 3),
        "detail": {
            "frames_per_sec": round(frames_per_sec, 1),
            "batch": args.batch,
            "faces_per_frame": FACES_PER_FRAME,
            "valid_faces_per_frame": faces,
            "batch_step_latency": _percentiles(samples),
            "device": str(jax.devices()[0]),
        },
    }


def bench_occ_adaptive(args, cfg, det_params, arc_params, log,
                       label="", stage_split=False):
    """Occupancy-adaptive bucketed embed (pipeline/bucketed.py) at the
    SAME 2/8 operating point as headline_occ. headline_occ's dense
    program still pays the full B*K-crop embed (~half the step) for the
    B*2 real faces; this path compacts valid crops and embeds a
    power-of-two bucket sized by the PREVIOUS step's occupancy rate, so
    embed cost tracks detections (the reference embeds only detected
    faces, src/main.cpp:226). The per-step count host fetch is part of
    the design and is inside the timed region — it overlaps program B's
    device execution, and the honest number must include it.

    arc_params may be any recognizer the fused pipeline accepts (the
    r50 pytree, mbf, or a QuantizedRecognizer) — the composition
    configs headline_occ_adaptive_{mbf,q8} reuse this runner.
    stage_split additionally times program A (detect+compact) and
    program B (bucketed embed) separately so the next bottleneck is
    named with data (VERDICT r4 item 2)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.pipeline.bucketed import BucketedEmbedPipeline

    VALID = 2
    cfg_occ = dataclasses.replace(cfg, skip_invalid_faces=True)
    pipe = BucketedEmbedPipeline(
        det_params, arc_params, cfg_occ,
        max_faces_embed=FACES_PER_FRAME, valid_cap=VALID,
    )

    # chain each step's input on the previous step's device outputs so
    # no runtime layer can elide/replay/drop executions (same
    # discipline as bench_headline); chaining on program A's counts
    # keeps the dependence ON DEVICE, so the pipelined loop below never
    # inserts a host sync into the chain.
    # CRITICAL for CROSS-program chains: the bump must be genuinely
    # value-dependent — a `v*0+1` form CONSTANT-FOLDS, the chain then
    # no longer depends on the measured program, and the async client
    # can defer/drop the dangling executions entirely (observed: a
    # 126 ms program "measured" at 38 ms). `1.0f + x*1e-38` is exactly
    # 1.0 for any bounded x (below one ulp) yet unfoldable.
    @jax.jit
    def chain(frames, counts):
        tiny = jnp.sum(counts).astype(jnp.float32) * 1e-38
        return frames + (1.0 + jnp.abs(tiny)).astype(jnp.uint8)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (args.batch, 640, 640, 3), dtype=np.uint8)
    )

    t0 = time.time()
    pend = pipe.start(frames)
    frames = chain(frames, pend.counts)
    _dets, feats, _n = pipe.finish(pend)
    float(jnp.sum(feats))
    log(f"compile+first run {time.time() - t0:.1f}s "
        f"(buckets compiled: {sorted(pipe._embed_jit)})")
    for _ in range(2):
        pend = pipe.start(frames)
        frames = chain(frames, pend.counts)
        _dets, feats, _n = pipe.finish(pend)
    float(jnp.sum(feats))
    pipe.corrections = 0  # warmup's full-bucket first step isn't steady state

    # throughput: the PIPELINED consumer shape (VideoPipeline/service
    # worker) — start(N+1) is dispatched before finish(N) pays the
    # count host fetch, so the per-step tunnel round trip overlaps the
    # next step's device work instead of serializing with it (the
    # whole point of the two-phase API). Corrections still apply
    # exactly at finish time.
    t0 = time.time()
    pend = pipe.start(frames)
    for _ in range(args.iters - 1):
        frames = chain(frames, pend.counts)
        nxt = pipe.start(frames)
        _dets, feats, _n = pipe.finish(pend)
        pend = nxt
    _dets, feats, _n = pipe.finish(pend)
    float(jnp.sum(feats))  # host fetch = true sync over the whole chain
    dt = time.time() - t0

    # latency: the SYNCHRONOUS one-batch-at-a-time shape (a caller that
    # needs each batch's results before producing the next) — per-step
    # wall incl. the count fetch + a feature fetch
    samples = []
    for _ in range(max(20, args.iters)):
        t1 = time.time()
        _dets, feats, _n = pipe(frames)
        frames = chain(frames, _dets.valid.astype(jnp.int32))
        float(jnp.sum(feats))
        samples.append(time.time() - t1)

    frames_per_sec = args.batch * args.iters / dt
    faces_per_sec = frames_per_sec * VALID
    out = {
        "metric": (
            "faces/sec/chip end-to-end, 2/8 occupancy "
            f"(adaptive bucketed embed{label})"
        ),
        "value": round(faces_per_sec, 1),
        "unit": "faces/sec",
        "vs_baseline": round(faces_per_sec / TARGET_FACES_PER_SEC, 3),
        "detail": {
            "frames_per_sec": round(frames_per_sec, 1),
            "batch": args.batch,
            "faces_per_frame": FACES_PER_FRAME,
            "valid_faces_per_frame": VALID,
            "steady_bucket": pipe.last_bucket,
            "corrections": pipe.corrections,
            "sync_step_latency": _percentiles(samples),
            "note": "throughput = pipelined two-phase loop (count fetch "
            "overlaps the next step's device work — the VideoPipeline/"
            "service worker shape); sync_step_latency = synchronous "
            "one-batch-at-a-time steps",
            "device": str(jax.devices()[0]),
        },
    }
    if stage_split:
        # name the next bottleneck with data: time program A
        # (detect+decode+NMS+align+warp+compact) and program B (bucketed
        # embed at the steady bucket) separately, same chained-input +
        # host-fetch discipline as every other sub-100ms measurement
        bucket = max(pipe.last_bucket, 1)
        pend = pipe.start(frames)
        crops_c, perm, valid_flat = pend.ops
        pipe.finish(pend)

        # value-dependent bumps (see the chain above: foldable forms let
        # the async client drop the dangling executions)
        @jax.jit
        def chain_frames(fr, c):
            tiny = jnp.sum(c).astype(jnp.float32) * 1e-38
            return fr + (1.0 + jnp.abs(tiny)).astype(jnp.uint8)

        @jax.jit
        def chain_crops(c, f):
            tiny = jnp.sum(f).astype(jnp.float32) * 1e-38
            return c + jnp.abs(tiny).astype(c.dtype)

        # program A alone
        fr = frames
        _, c0, _, _, cnt = pipe._detect(fr)
        fr = chain_frames(fr, c0)
        float(jnp.sum(cnt))
        t0 = time.time()
        for _ in range(args.iters):
            _, c0, _, _, cnt = pipe._detect(fr)
            fr = chain_frames(fr, c0)
        float(jnp.sum(cnt))
        a_ms = (time.time() - t0) * 1000.0 / args.iters
        # program B alone at the steady bucket
        cc = crops_c
        f0 = pipe._embed(bucket, cc, perm, valid_flat)
        cc = chain_crops(cc, f0)
        float(jnp.sum(f0))
        t0 = time.time()
        for _ in range(args.iters):
            f0 = pipe._embed(bucket, cc, perm, valid_flat)
            cc = chain_crops(cc, f0)
        float(jnp.sum(f0))
        b_ms = (time.time() - t0) * 1000.0 / args.iters
        out["detail"]["stage_split_ms"] = {
            "program_a_detect_compact": round(a_ms, 2),
            "program_b_embed_bucket": round(b_ms, 2),
            "bucket": bucket,
            "note": "per-step wall incl. one tunnel round trip each; "
            "the composed adaptive step overlaps B with A's count fetch",
        }
    return out


def bench_serve(args, cfg, det_params, arc_params, log):
    """In-process serving load bench at the production operating point
    (VERDICT r4 items 1+4): concurrent synthetic clients through the
    REAL IdentifyService (micro-batching worker, futures, fused
    one-dispatch identify vs a 10k gallery, 2/8 forced occupancy),
    dense vs `--adaptive-embed`, recording qps + enqueue→result
    percentiles + the coalesced batch size.

    Two layers, deliberately separate (same split as the video config):
    - e2e qps: every request's pixels cross the host→device link, so on
      this tunneled host the number is link-bound (~1.2 MB/frame at the
      probed MB/s) and dense≈adaptive. Honest and annotated.
    - device serve-shaped A/B: the services' OWN compiled programs
      (the exact objects `serve` dispatches) driven with device-chained
      frames — the ratio a PCIe-attached serving host gets.
    """
    import dataclasses
    import threading

    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.match.gallery import GalleryBank
    from facerecognizeonnx_tpu.pipeline.service import IdentifyService

    VALID = 2
    G = 10240
    cfg_occ = dataclasses.replace(cfg, skip_invalid_faces=True)
    bank = GalleryBank()
    rngb = np.random.default_rng(1)
    g = rngb.normal(size=(G, 512)).astype(np.float32)
    bank.add_batch([f"p{i}" for i in range(G)], g)

    rng = np.random.default_rng(0)
    pool = [
        rng.integers(0, 256, (640, 640, 3), dtype=np.uint8)
        for _ in range(32)
    ]
    h2d_mbps = _probe_h2d_rate_mbps(log)
    log(f"h2d link probe: {h2d_mbps} MB/s")

    results = {}
    for name, adaptive in (("dense", False), ("adaptive", True)):
        svc = IdentifyService(
            det_params, arc_params, bank, cfg_occ,
            max_batch=args.batch, batch_window_ms=20.0,
            fuse_search=True, search_top_k=5,
            adaptive_embed=adaptive, valid_cap=VALID,
        )
        try:
            t0 = time.time()
            svc.identify(pool[0], top_k=1, timeout=1800.0)  # compile+warm
            log(f"serve[{name}] warmup {time.time() - t0:.1f}s")

            # ---- e2e load: closed-loop, in-flight bounded at 2 batches
            # so p99 measures the service, not an unbounded queue
            NREQ = args.batch * 6
            sem = threading.BoundedSemaphore(2 * args.batch)
            futs = []
            t0 = time.time()
            for i in range(NREQ):
                sem.acquire()
                fut = svc.identify_async(pool[i % len(pool)], top_k=1)
                fut.add_done_callback(lambda f: sem.release())
                futs.append(fut)
            for f in futs:
                f.result(timeout=900.0)
            wall = time.time() - t0
            st = svc.stats()
            entry = {
                "qps_frames": round(NREQ / wall, 1),
                "qps_valid_faces": round(NREQ * VALID / wall, 1),
                "latency_ms": st.get("latency_ms"),
                "avg_batch": round(st["avg_batch"], 1),
            }

            # ---- device serve-shaped A/B through the service programs
            # tile the pool up to the FULL service batch (pool[:batch]
            # would silently truncate to len(pool) and measure a
            # smaller program than the service serves)
            frames = jnp.asarray(
                np.stack([pool[i % len(pool)] for i in range(args.batch)])
            )
            bank_dev, n_rows, _ = svc.bank.device_bank_padded(
                sharding=svc._bank_sharding
            )

            # value-dependent but exactly-+1 bump (see bench_occ_adaptive:
            # a foldable bump lets the async client drop the dangling
            # program executions and report dispatch time as device time)
            @jax.jit
            def chain(fr, v):
                tiny = jnp.sum(v).astype(jnp.float32) * 1e-38
                return fr + (1.0 + jnp.abs(tiny)).astype(jnp.uint8)

            iters = max(10, args.iters // 2)
            if adaptive:
                # the pipelined-worker shape: start(N+1) dispatched
                # before finish(N) pays the count fetch (exactly what
                # the service worker does one batch deep)
                bk = svc._bucketed
                pend = bk.start(frames, bank_padded=bank_dev, n_rows=n_rows)
                frames = chain(frames, pend.counts)
                _d, _f, sims, _i, _n = bk.finish(pend)
                float(jnp.sum(sims))
                t0 = time.time()
                pend = bk.start(frames, bank_padded=bank_dev, n_rows=n_rows)
                for _ in range(iters - 1):
                    frames = chain(frames, pend.counts)
                    nxt = bk.start(
                        frames, bank_padded=bank_dev, n_rows=n_rows
                    )
                    _d, _f, sims, _i, _n = bk.finish(pend)
                    pend = nxt
                _d, _f, sims, _i, _n = bk.finish(pend)
                float(jnp.sum(sims))
                dt = time.time() - t0
            else:
                def step(fr):
                    _d, _f, sims, _i = svc._fused(
                        fr, bank_dev, jnp.int32(n_rows)
                    )
                    return sims
                sims = step(frames)
                frames = chain(frames, sims)
                float(jnp.sum(sims))
                t0 = time.time()
                for _ in range(iters):
                    sims = step(frames)
                    frames = chain(frames, sims)
                float(jnp.sum(sims))
                dt = time.time() - t0
            entry["device_valid_faces_per_sec"] = round(
                args.batch * VALID * iters / dt, 1
            )
            entry["device_step_ms"] = round(dt * 1000.0 / iters, 1)
            results[name] = entry
        finally:
            svc.close()

    dense_dev = results["dense"]["device_valid_faces_per_sec"]
    adapt_dev = results["adaptive"]["device_valid_faces_per_sec"]
    best = results["adaptive"]
    return {
        "metric": (
            "serving identify qps, 2/8 occupancy, 10k gallery "
            "(IdentifyService, fused search, adaptive embed)"
        ),
        "value": best["qps_frames"],
        "unit": "frames/sec",
        # the e2e number is link-bound on this host; the baseline column
        # reports the DEVICE-level adaptive/dense service ratio instead
        # (what `serve --adaptive-embed` buys a PCIe-attached host)
        "vs_baseline": round(adapt_dev / max(dense_dev, 1e-9), 2),
        "detail": {
            "dense": results["dense"],
            "adaptive": results["adaptive"],
            "requests": args.batch * 6,
            "max_batch": args.batch,
            "batch_window_ms": 20.0,
            "h2d_link_mbytes_per_sec": h2d_mbps,
            "note": "e2e qps ships real pixels over the probed link "
            "(~1.2 MB/frame) — link-bound here like the video config; "
            "device_* rows drive the services' own compiled programs "
            "with device-resident chained frames, so the adaptive/dense "
            "ratio (vs_baseline) is the serving-surface win itself",
        },
    }


REFERENCE_FRAME_MS = 2122.0  # torch-CPU stand-in of the reference frame
# loop: detect + 8 embeds per frame (BASELINE.md, tools/
# cpu_reference_baseline.py) — the reference webcam inner loop's cost
# (src/main.cpp:214-257), the right baseline for an interactive-latency
# config


def bench_latency(args, cfg, det_params, arc_params, log):
    """Interactive single-frame latency: ONE 640x640 frame through the
    fused detect+align+embed program (the reference webcam inner loop at
    batch 1, src/main.cpp:214-257).

    Two numbers, deliberately separate:
    - device ms/frame — scan-amortized (CHAIN data-dependent steps in
      ONE dispatch), because a single few-ms dispatch is unmeasurable
      through the tunnel RTT (docs/PERFORMANCE.md timing discipline);
    - wall p50/p99 per call — includes the dispatch round trip, i.e.
      what a caller of THIS host actually waits.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.pipeline.fused import frames_to_features

    CHAIN = 20

    def one_step(frames, _):
        _dets, feats = frames_to_features(
            det_params, arc_params, frames, cfg, max_faces_embed=FACES_PER_FRAME
        )
        bump = (jnp.abs(jnp.sum(feats)) * 0.0 + 1.0).astype(jnp.uint8)
        return frames + bump, jnp.sum(feats)

    @jax.jit
    def chained(frames):
        frames, ss = jax.lax.scan(one_step, frames, None, length=CHAIN)
        return frames, ss[-1]

    @jax.jit
    def single(frames):
        return one_step(frames, None)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (1, 640, 640, 3), dtype=np.uint8))

    t0 = time.time()
    frames, s = chained(frames)
    float(s)
    log(f"latency chained compile+first {time.time() - t0:.1f}s")
    f1, s = single(frames)
    float(s)

    t0 = time.time()
    outer = max(3, args.iters // 4)
    for _ in range(outer):
        frames, s = chained(frames)
    float(s)  # host fetch = true sync over the whole sequential chain
    device_ms = (time.time() - t0) * 1000.0 / (outer * CHAIN)

    samples = []
    for _ in range(30):
        t1 = time.time()
        f1, s = single(f1)
        float(s)
        samples.append(time.time() - t1)

    # serving identify A/B: TWO dispatches (feature program, host sync of
    # feats, gallery-search program) vs ONE fused dispatch
    # (pipeline/fused.frames_to_matches, `serve --fuse-search`). The win
    # is the host round trip itself — each input chains on the previous
    # output so no call can be elided. Bank passed as an ARGUMENT (a
    # closed-over bank lowers as a module constant — round-3 probe bug).
    from facerecognizeonnx_tpu.match.similarity import similarity_matrix
    from facerecognizeonnx_tpu.pipeline.fused import frames_to_matches

    G = 10240
    bank = rng.normal(size=(G, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    bank_dev = jnp.asarray(bank)

    def _bump(frames, v):
        return frames + (jnp.abs(jnp.sum(v)) * 0.0 + 1.0).astype(jnp.uint8)

    @jax.jit
    def feats_step(frames):
        _d, feats = frames_to_features(
            det_params, arc_params, frames, cfg,
            max_faces_embed=FACES_PER_FRAME,
        )
        return _bump(frames, feats), feats

    @jax.jit
    def search_step(q, bank):
        return jax.lax.top_k(similarity_matrix(q, bank), 5)

    @jax.jit
    def fused_step(frames, bank, n):
        _d, _f, v, i = frames_to_matches(
            det_params, arc_params, frames, bank, n, cfg,
            max_faces_embed=FACES_PER_FRAME, top_k=5,
        )
        return _bump(frames, v), v, i

    t0 = time.time()
    f2, feats = feats_step(f1)
    q = np.asarray(feats).reshape(-1, 512)
    v, _ = search_step(jnp.asarray(q), bank_dev)
    np.asarray(v)
    f3, v, _ = fused_step(f1, bank_dev, jnp.int32(G))
    np.asarray(v)
    log(f"identify A/B compile+first {time.time() - t0:.1f}s")

    two_disp, one_disp = [], []
    for _ in range(20):
        t1 = time.time()
        f2, feats = feats_step(f2)
        q = np.asarray(feats).reshape(-1, 512)  # host sync between stages
        v, _ = search_step(jnp.asarray(q), bank_dev)
        np.asarray(v)
        two_disp.append(time.time() - t1)
    for _ in range(20):
        t1 = time.time()
        f3, v, _ = fused_step(f3, bank_dev, jnp.int32(G))
        np.asarray(v)
        one_disp.append(time.time() - t1)

    return {
        "metric": "single-frame e2e latency, detect+align+embed K=8 (device)",
        "value": round(device_ms, 2),
        "unit": "ms/frame",
        # speedup over the measured reference frame loop (2,122 ms) —
        # the only latency baseline that exists; >1 is better
        "vs_baseline": round(REFERENCE_FRAME_MS / device_ms, 1),
        "detail": {
            "chain": CHAIN,
            "outer": outer,
            "wall_per_call": _percentiles(samples),
            "baseline": "reference frame loop, torch-CPU stand-in, "
            f"{REFERENCE_FRAME_MS} ms/frame",
            "note": "wall_per_call includes the host->device dispatch "
            "round trip (tunnel RTT on this host); the device number is "
            "the framework's",
            "serving_identify": {
                "gallery_rows": G,
                "two_dispatch_wall": _percentiles(two_disp),
                "fused_one_dispatch_wall": _percentiles(one_disp),
                "note": "identify = frame->features->gallery top-5; "
                "fused (serve --fuse-search) pays ONE host round trip",
            },
        },
    }


def bench_enroll(args, cfg, arc_params, log):
    """BASELINE config 3: 256-image batched enrollment (align+embed).

    Scan-amortized like the gallery config: 10 chained embeds per
    dispatch so the ~20 ms program isn't ranked by the tunnel round-trip
    (per-dispatch under-reported this by ~25%). Batch 256 measured best
    (12.5k vs 11.7k at 128 — bf16 activations keep the embed scaling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.embed.pipeline import embed_crops

    rng = np.random.default_rng(0)
    batch = 256
    crops0 = jnp.asarray(rng.integers(0, 256, (batch, 112, 112, 3), dtype=np.uint8))
    INNER = 10

    def prog(c):
        def body(c, _):
            feats = embed_crops(arc_params, c, cfg)
            bump = (jnp.abs(jnp.sum(feats)) * 0.0 + 1.0).astype(jnp.uint8)
            return c + bump, jnp.sum(feats)
        cf, ss = jax.lax.scan(body, c, None, length=INNER)
        return ss[-1], cf

    jfn = jax.jit(prog)
    s, crops = jfn(crops0)
    float(s)
    t0 = time.time()
    outer = 3
    for _ in range(outer):
        s, crops = jfn(crops)
    float(s)
    rate = batch * outer * INNER / (time.time() - t0)
    return {
        "metric": "batched enrollment embed throughput",
        "value": round(rate, 1), "unit": "faces/sec",
        "vs_baseline": round(rate / TARGET_FACES_PER_SEC, 3),
        "detail": {"batch": batch, "gallery_256_seconds": round(256 / rate, 3)},
    }


def bench_gallery(args, log):
    """BASELINE config 5: 100k-embedding 1:N cosine top-k on MXU."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facerecognizeonnx_tpu.ops.pallas_gallery import (
        gallery_topk_pallas,
        gallery_topk_reference,
        gallery_topk_tiled,
    )

    rng = np.random.default_rng(0)
    g = rng.normal(size=(100_000, 512)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q0 = jnp.asarray(g[:128])
    g = jnp.asarray(g)

    # bf16 bank AT REST (cast once, outside the timed loop — matching
    # GalleryBank's cached device copy). A per-call cast measured SLOWER
    # than f32 (137k vs 152k q/s): the cast is loop-variant inside the
    # scan, so it pays a full 205 MB read + 102 MB write per search.
    g16 = g.astype(jnp.bfloat16)

    results = {}
    INNER = 20  # chained searches per dispatch: wall/INNER ≈ device time
    for name, fn in (
        ("xla_materialize", lambda q: gallery_topk_reference(q, g, 5)),
        ("xla_bf16_at_rest", lambda q: gallery_topk_reference(
            q.astype(jnp.bfloat16), g16, 5)),
        ("tiled512", lambda q: gallery_topk_tiled(q, g, 5, tile=512)),
        ("pallas_stream", lambda q: gallery_topk_pallas(q, g, 5)),
    ):
        try:
            # INNER chained top-k calls inside ONE program: chaining
            # defeats axon's identical-execution elision AND the single
            # dispatch amortizes the tunnel round-trip that otherwise
            # dominates (per-dispatch timings mis-rank these methods by
            # 2-8x — docs/PERFORMANCE.md).
            def prog(q, f=fn):
                def body(q, _):
                    s, _i = f(q)
                    return q + jnp.sum(s) * 1e-12, jnp.sum(s)
                qf, ss = jax.lax.scan(body, q, None, length=INNER)
                return ss[-1], qf
            jfn = jax.jit(prog)
            s, q = jfn(q0)
            float(s)
            t0 = time.time()
            outer = 3
            for _ in range(outer):
                s, q = jfn(q)
            float(s)
            results[name] = 128 * outer * INNER / (time.time() - t0)
        except Exception as e:  # pallas may be unsupported on cpu backend
            log(f"{name} failed: {e}")
    best = max(results.values()) if results else 0.0
    return {
        "metric": "1:N identification, 100k gallery top-5",
        "value": round(best, 1), "unit": "queries/sec",
        # the 5,000-faces/sec e2e target does not apply to a queries/sec
        # metric and the reference has no 1:N mode at all — no baseline
        "vs_baseline": None,
        "detail": {k: round(v, 1) for k, v in results.items()},
    }


REFERENCE_VIDEO_FPS = 0.47  # torch-CPU stand-in of the reference frame
# loop: 2,122 ms/frame at 8 faces/frame (BASELINE.md, tools/
# cpu_reference_baseline.py) — the only measured baseline for this config


def _probe_hbm_gbps(log):
    """Device HBM read-bandwidth probe, recorded in the final JSON so a
    contended/degraded chip annotates its own numbers (observed
    2026-08-18: f32-heavy configs ran ~1.6× the record while the chip
    was shared — docs/PERFORMANCE.md contention caveat). Two chained-
    scan lengths difference out the dispatch/tunnel constant."""
    import jax
    import jax.numpy as jnp

    try:
        x = jax.jit(
            lambda k: jax.random.normal(k, (64 * 1024 * 1024,), jnp.float32)
        )(jax.random.PRNGKey(0))  # 256 MB resident

        def prog(c, x, length):
            def body(c, _):
                # the multiply depends on the carry, so XLA cannot hoist
                # the loop-invariant reduction out of the scan (measured:
                # a plain sum(x) chain reports the elided ~8 TB/s)
                return c + jnp.sum(x * (1.0 + c * 1e-30)) * 1e-30, ()
            c, _ = jax.lax.scan(body, c, None, length=length)
            return c

        times = {}
        for length in (32, 256):
            f = jax.jit(functools.partial(prog, length=length))
            float(f(jnp.float32(0.0), x))  # compile + warm
            t0 = time.time()
            float(f(jnp.float32(0.0), x))
            times[length] = time.time() - t0
        dt = times[256] - times[32]
        if dt <= 0:
            return None
        return round(x.nbytes * (256 - 32) / dt / 1e9, 1)
    except Exception as e:
        log(f"hbm probe failed: {e}")
        return None


def _probe_h2d_rate_mbps(log):
    """Measure host→device transfer bandwidth so the video number can be
    read against the link it is bounded by (the axon tunnel measures
    ~20 MB/s; a PCIe-attached v5e host measures tens of GB/s)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        buf = np.random.default_rng(0).integers(
            0, 256, (16, 1024, 1024), dtype=np.uint8
        )  # 16 MB
        dev = jax.devices()[0]
        # first transfer warms any lazy connection setup; time the second
        float(jnp.sum(jax.device_put(buf[:1], dev)))
        t0 = time.time()
        float(jnp.sum(jax.device_put(buf, dev)))
        dt = time.time() - t0
        return round(buf.nbytes / dt / 1e6, 1)
    except Exception as e:
        log(f"h2d probe failed: {e}")
        return None


def bench_video(args, cfg, det_params, arc_params, log):
    """BASELINE config 4: 1080p frame-loop throughput (host letterbox in
    the prefetch thread + micro-batched fused device program)."""
    import numpy as np

    from facerecognizeonnx_tpu.io.imageio import VideoSource
    from facerecognizeonnx_tpu.pipeline.video import VideoPipeline

    from facerecognizeonnx_tpu.utils.observability import Counter

    h2d_mbps = _probe_h2d_rate_mbps(log)
    log(f"h2d link probe: {h2d_mbps} MB/s")
    pipe = VideoPipeline(det_params, arc_params, cfg, batch=args.batch)
    ref = np.zeros(512, np.float32)
    # warmup: compile + cache the program off the clock
    warm = VideoSource("synthetic:1920x1080x%d" % (2 * args.batch))
    for _ in pipe.run(warm.frames(), ref_feature=ref):
        pass
    pipe.counter = Counter("frames")

    src = VideoSource("synthetic:1920x1080x%d" % (args.batch * args.iters))
    n = 0
    for _ in pipe.run(src.frames(), ref_feature=ref):
        n += 1
    stats = pipe.stats()
    fps = stats["frames_per_sec"]
    return {
        "metric": "1080p video stream detect+verify",
        "value": round(fps, 1), "unit": "frames/sec",
        # baselined against the measured reference-configuration frame
        # loop (torch-CPU stand-in, 0.47 fps — BASELINE.md), the only
        # number that exists for this config; the 5k faces/sec e2e
        # target does not apply to a host-I/O-bound stream
        "vs_baseline": round(fps / REFERENCE_VIDEO_FPS, 1),
        "detail": {
            "frames": n, "p50_ms": round(stats["p50_ms"], 2),
            "p99_ms": round(stats["p99_ms"], 2),
            "baseline": "reference frame loop, torch-CPU stand-in, 0.47 fps",
            # measured 2-28 fps across sessions purely with tunnel load:
            # each letterboxed frame is ~1.18 MB and must cross the link
            # probed below; the device program itself is ~1.6 ms/frame at
            # batch 64 (docs/PERFORMANCE.md) — PCIe hosts are device-bound
            "h2d_link_mbytes_per_sec": h2d_mbps,
            "note": "bounded by the host->device link (see h2d probe), "
            "not the framework",
        },
    }


if __name__ == "__main__":
    main()
