"""Profiling: per-stage step timers + jax profiler traces.

The reference ships zero instrumentation (SURVEY.md §5: only tqdm
postfix stats); per-stage timings are table stakes for the throughput
target. StageTimer aggregates wall-clock per named stage across rollout
steps; `trace()` wraps a block in a jax profiler trace for xprof.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_ms": round(1e3 * self.totals[k] /
                                     max(self.counts[k], 1), 3)}
                for k in sorted(self.totals)}

    def reset(self):
        self.totals.clear()
        self.counts.clear()

    def report(self, logger=None):
        s = self.summary()
        lines = ["per-stage timings:"]
        for k, v in s.items():
            lines.append("  %-24s %8.1f ms/call x %5d = %7.2f s"
                         % (k, v["mean_ms"], v["count"], v["total_s"]))
        msg = "\n".join(lines)
        if logger is not None:
            logger.info(msg)
        return msg


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax profiler trace (view with xprof/tensorboard); no-op if None."""
    if log_dir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
