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
