"""bench.py watchdog: a wedged config (lost remote-RPC hang, observed
on the tunneled TPU backend) must not cost the driver the round-end
JSON line. The selftest config exercises the machinery without jax:
it hangs forever on its first attempt when FRT_BENCH_TEST_HANG is set.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=60):
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, BENCH, "--config", "selftest"],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


def test_selftest_passes_without_hang():
    p = _run({})
    assert p.returncode == 0, p.stderr
    doc = json.loads(p.stdout.strip().splitlines()[-1])
    assert doc["metric"] == "bench watchdog selftest"
    assert doc["detail"]["attempt"] == 0


def test_watchdog_reexecs_past_a_wedged_config():
    p = _run({"FRT_BENCH_TEST_HANG": "1", "FRT_BENCH_CONFIG_DEADLINE_S": "3"})
    assert p.returncode == 0, p.stderr
    doc = json.loads(p.stdout.strip().splitlines()[-1])
    # succeeded on the retry, in the re-exec'd process
    assert doc["metric"] == "bench watchdog selftest"
    assert doc["detail"]["attempt"] == 1
    assert doc["detail"]["reexecs"] == 1
    assert "WATCHDOG" in p.stderr


def test_watchdog_emits_partial_json_when_budget_exhausted():
    p = _run({
        "FRT_BENCH_TEST_HANG": "1",
        "FRT_BENCH_CONFIG_DEADLINE_S": "2",
        "FRT_BENCH_MAX_REEXECS": "0",
    })
    assert p.returncode == 0, p.stderr
    doc = json.loads(p.stdout.strip().splitlines()[-1])
    # the line of record is still parseable, with the failure in-band
    assert doc["value"] == 0.0
    assert "timed out" in doc["detail"]["configs"]["selftest"]["error"]


def test_final_line_is_compact_and_parseable(capsys):
    """VERDICT r3 item 1: BENCH_r03 lost the round's numbers because the
    final JSON line outgrew the driver's ~2,000-byte tail capture. The
    line of record must stay <1,900 bytes with ALL configs populated
    (full detail goes to the preceding line + bench_detail.json)."""
    import bench

    full_detail = {
        "frames_per_sec": 962.3, "batch": 128, "faces_per_frame": 8,
        "valid_faces_per_frame": 8,
        "batch_step_latency": {"samples": 20, "p50_ms": 132.97,
                               "p90_ms": 134.1, "p99_ms": 140.2},
        "device": "TPU v5 lite0",
    }
    order = ["headline", "headline_mbf", "headline_q8", "headline_onnx",
             "headline_occ", "headline_occ_adaptive", "latency", "enroll",
             "gallery", "video"]
    results = {
        name: {
            "metric": f"a metric string for {name} that is quite long",
            "value": 7698.2, "unit": "faces/sec", "vs_baseline": 1.54,
            "detail": dict(full_detail),
        }
        for name in order
    }
    results["gallery"] = {
        "metric": "1:N identification, 100k gallery top-5",
        "value": 164011.8, "unit": "queries/sec", "vs_baseline": None,
        "detail": {"xla_materialize": 159145.2, "xla_bf16_at_rest": 164011.8,
                   "tiled512": 44960.5, "pallas_stream": 98555.4},
    }
    results["video"] = {"error": "x" * 500}  # errors must truncate
    results["_hbm_gbps"] = 746.8
    bench._emit_final(results, order)
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2  # full document, then the compact line
    compact = lines[-1]
    assert len(compact) < 1900, len(compact)
    doc = json.loads(compact)
    assert doc["value"] == 7698.2 and doc["vs_baseline"] == 1.54
    cfgs = doc["detail"]["configs"]
    for name in order[1:]:
        assert name in cfgs
    assert cfgs["headline_q8"]["value"] == 7698.2
    assert len(cfgs["video"]["error"]) <= 60
    assert doc["detail"]["hbm_read_gbps"] == 746.8
    # the full document (line 0) carries everything, and the same doc
    # landed in bench_detail.json
    full = json.loads(lines[0])
    assert full["detail"]["configs"]["gallery"]["detail"]["tiled512"] == 44960.5
    with open(os.path.join(REPO, "bench_detail.json")) as f:
        assert json.load(f) == full


def test_hbm_probe_returns_plausible_rate():
    """The HBM probe must produce a real bandwidth, not the ~8 TB/s of
    an XLA-elided loop-invariant reduction (the carry-dependent multiply
    is what keeps the scan honest)."""
    import bench

    gbps = bench._probe_hbm_gbps(lambda *_: None)
    assert gbps is not None
    # host DDR lands in the tens-to-hundreds of GB/s; an elided scan
    # reports thousands. The guard is the HIGH side (elision); the low
    # bound only screens zeros/negatives — a loaded CI host can measure
    # well under 1 GB/s (seen at full-suite + bench contention).
    assert 0.01 < gbps < 3000.0, gbps
