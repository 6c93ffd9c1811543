"""Tracing, per-stage timing, and throughput counters.

The reference's only observability is std::cout progress prints ON the
hot path (SURVEY.md §5: src/face_detector.cpp:191-202 prints every
inference's shapes, which would wreck throughput). Here:
  - the hot path is print-free by construction (it's a compiled program)
  - `StageTimer` wraps host-side stages behind a flag (zero cost off)
  - `Counter` tracks faces/sec & p50/p99 latency (BASELINE.md metrics)
  - `trace` context starts a jax.profiler trace viewable in Perfetto
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, List

logger = logging.getLogger("facerecognizeonnx_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(
        logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
    )
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class StageTimer:
    """Wall-clock per-stage accumulation. enabled=False → near-zero cost."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            n = self.counts[name]
            lines.append(f"{name}: {total * 1e3:.1f}ms total, {total / n * 1e3:.2f}ms avg x{n}")
        return "\n".join(lines)


class Counter:
    """Throughput + latency percentiles for a repeated event."""

    def __init__(self, name: str = "frames"):
        self.name = name
        self._durations: List[float] = []
        self._items = 0
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def event(self, items: int = 1):
        t0 = time.perf_counter()
        yield
        self._durations.append(time.perf_counter() - t0)
        self._items += items

    def summary(self) -> Dict[str, float]:
        import numpy as np

        elapsed = time.perf_counter() - self._t0
        d = np.asarray(self._durations) * 1e3
        return {
            f"{self.name}_per_sec": self._items / max(elapsed, 1e-9),
            "p50_ms": float(np.percentile(d, 50)) if len(d) else 0.0,
            "p99_ms": float(np.percentile(d, 99)) if len(d) else 0.0,
            "count": len(d),
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/frt_trace"):
    """jax.profiler trace (open in Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
