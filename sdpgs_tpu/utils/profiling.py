"""Profiling hooks: jax.profiler traces + per-step timing (SURVEY.md §5
calls this a first-class need; the reference's CUDA timing events are dead
code, train.py:57-58)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA + aggregate per-section wall timing with device sync."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Dict[str, float] = {}
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync_result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync_result is not None:
            jax.block_until_ready(sync_result)
        dt = time.perf_counter() - t0
        self.total[name] += dt
        self.count[name] += 1
        self.avg[name] = (
            dt if name not in self.avg
            else self.ema * self.avg[name] + (1 - self.ema) * dt
        )

    def summary(self) -> Dict[str, float]:
        return {k: self.total[k] / max(self.count[k], 1) for k in self.total}

    def report(self) -> str:
        return " | ".join(
            f"{k}: {v * 1000:.1f}ms" for k, v in sorted(self.summary().items())
        )
