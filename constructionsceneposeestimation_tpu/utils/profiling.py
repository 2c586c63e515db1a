"""Tracing / profiling helpers (SURVEY.md section 5: the reference has none;
timing there is implicit in asyncio sleeps).

* ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution.
* ``annotate(name)``: named region that shows up inside the trace.
* ``chained_ms``: THE reliable throughput measurement — a device-side
  ``lax.scan`` whose steps are serialized by folding a value derived from the
  previous result into the next iteration's inputs, with ONE host fetch at
  the end. Both naive alternatives mis-measure on this stack: async
  submit-then-block under-reports (the axon tunnel's block_until_ready does
  not cover queued predecessors) and ``int32 * 0`` fake dependencies get
  constant-folded by XLA (f32 ``* 0`` survives — inf/nan semantics).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp


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


def chained_ms(step_fn: Callable, n: int = 16, args: tuple = ()) -> float:
    """Per-iteration milliseconds of ``step_fn(acc: f32 scalar, *args) -> f32
    scalar`` under a genuine sequential chain.

    ``step_fn`` must mix ``acc`` into its computation un-elidably — fold it
    into a PRNG seed (``jax.random.fold_in(key, acc.astype(int32))``) or add
    it to f32 data (never ``int * 0``).

    Pass large device arrays through ``args``, NOT via closure: a
    closed-over concrete array is embedded as an HLO literal, and the axon
    tunnel's remote-compile endpoint rejects / crawls on multi-hundred-MB
    program uploads (observed: HTTP 413 at ~1.4 GB).
    """
    run = jax.jit(lambda a, *xs: jax.lax.fori_loop(
        0, n, lambda i, acc: step_fn(acc, *xs), a))
    float(jax.block_until_ready(run(jnp.float32(0.0), *args)))  # compile+warm
    t0 = time.perf_counter()
    float(jax.block_until_ready(run(jnp.float32(1.0), *args)))
    return (time.perf_counter() - t0) / n * 1e3


class Stopwatch:
    """Named collection of chained measurements."""

    def __init__(self):
        self.results: Dict[str, float] = {}

    def measure(self, name: str, step_fn: Callable, n: int = 16) -> float:
        ms = chained_ms(step_fn, n)
        self.results[name] = ms
        return ms

    def report(self) -> str:
        return "\n".join(f"{k}: {v:.3f} ms" for k, v in self.results.items())
