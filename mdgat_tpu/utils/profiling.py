"""Tracing/profiling as a first-class module.

The reference had only commented-out ``time.time()`` probes
(``models/mdgat.py:79-96``) and ad-hoc epoch timers. Here: phase timers
with mean/percentile reporting plus ``jax.profiler`` trace annotations for
XLA/TPU timelines (view with TensorBoard's profile plugin or Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in the device trace (no-op overhead when not tracing)."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class PhaseTimer:
    """Wall-clock phase accumulator: ``with timer('data'): ...``."""

    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, phase: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[phase].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for k, v in self.times.items():
            arr = sorted(v)
            out[k] = {
                "count": len(v),
                "total": sum(v),
                "mean": sum(v) / len(v),
                "p50": arr[len(arr) // 2],
                "max": arr[-1],
            }
        return out

    def report(self) -> str:
        lines = []
        for k, s in sorted(self.summary().items()):
            lines.append(f"{k:>16}: n={s['count']:<5} total={s['total']:.2f}s "
                         f"mean={s['mean'] * 1e3:.2f}ms max={s['max'] * 1e3:.2f}ms")
        return "\n".join(lines)
