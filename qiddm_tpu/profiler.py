"""Lightweight tracing/profiling hooks.

The reference has no profiling beyond tqdm bars (SURVEY §5.1). Here:
phase timers aggregated into a metrics dict, plus a thin wrapper over the
JAX profiler for TPU traces (viewable in TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("train_epoch"): ...
    timer.summary() -> {"train_epoch": {"total_s": ..., "count": ...}}
    """

    def __init__(self):
        self._acc: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": self._acc[k], "count": self._count[k],
                "mean_s": self._acc[k] / max(self._count[k], 1)}
            for k in self._acc
        }

    def report(self) -> str:
        lines = [f"{k:24s} total={v['total_s']:8.3f}s n={v['count']:4d} "
                 f"mean={v['mean_s']*1e3:8.2f}ms"
                 for k, v in sorted(self.summary().items())]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX device profile (xprof) for the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


GLOBAL_TIMER = PhaseTimer()
