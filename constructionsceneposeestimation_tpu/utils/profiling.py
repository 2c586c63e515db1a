"""Tracing / profiling helpers (SURVEY.md section 5: the reference has none;
timing there is implicit in asyncio sleeps).

* ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution.
* ``annotate(name)``: named region that shows up inside the trace.
* ``Stopwatch``: async-dispatch-aware host-side stage timer — submits work
  without per-call blocking so the axon tunnel's ~25 ms round-trip doesn't
  pollute measurements (the failure mode that initially hid the renderer's
  real cost profile).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region: ``with profiling.annotate('render'): ...``"""
    return jax.profiler.TraceAnnotation(name)


class Stopwatch:
    """Measure steady-state per-call latency of jitted functions by
    submitting ``n`` async calls and blocking once."""

    def __init__(self):
        self.results: Dict[str, float] = {}

    def measure(self, name: str, fn: Callable, *args, n: int = 20,
                warmup: int = 1) -> float:
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        outs: List = [fn(*args) for _ in range(n)]
        jax.block_until_ready(outs[-1])
        dt = (time.perf_counter() - t0) / n
        self.results[name] = dt
        return dt

    def report(self) -> str:
        lines = [f"{k}: {v * 1e3:.3f} ms" for k, v in self.results.items()]
        return "\n".join(lines)
