"""Tracing / metrics: per-stage timing and structured per-frame status.

The reference has only ad-hoc wall-clock prints (graph_slam.cpp:311-318,
loop_detector.hpp:132-158) and the ScanMatchingStatus topic. Here tracing is
built in from day one (SURVEY.md §5): every pipeline stage records wall
times into a registry that can be dumped as JSON or a Chrome
trace-event file (loadable in Perfetto / chrome://tracing), alongside the
jax.profiler hooks for on-device traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, List, Optional


class StageTimer:
    """Aggregating wall-clock timer with trace-event export."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.events: List[dict] = []
        self._t0 = time.perf_counter()
        self.keep_events = True

    @contextlib.contextmanager
    def span(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            end = time.perf_counter()
            self.totals[name] += end - start
            self.counts[name] += 1
            if self.keep_events:
                self.events.append(
                    {
                        "name": name,
                        "ph": "X",
                        "ts": (start - self._t0) * 1e6,
                        "dur": (end - start) * 1e6,
                        "pid": 0,
                        "tid": 0,
                    }
                )

    def summary(self) -> Dict[str, dict]:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "count": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / max(1, self.counts[name]), 3),
            }
            for name in sorted(self.totals)
        }

    def dump_chrome_trace(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"traceEvents": self.events}, f)

    def dump_summary(self, path: Optional[str] = None) -> str:
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


GLOBAL_TIMER = StageTimer()


@contextlib.contextmanager
def device_trace(logdir: str):
    """On-device profiling via jax.profiler (TensorBoard/Perfetto format)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
