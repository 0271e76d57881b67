"""Tracing and timing utilities.

The reference's only observability hook is the `_Diag` ping/error monitor
(qmmx_monolithic.py:31-46).  The rebuild's analog for the compute path is
real profiler integration (SURVEY.md §5 "tracing/profiling"):

* ``trace(logdir)`` — a context manager around ``jax.profiler`` producing
  TensorBoard-compatible traces of device execution;
* ``annotate(name)`` — a ``TraceAnnotation`` for host-side spans;
* ``time_fn`` — a steady-state timing harness (compile excluded, full result
  materialization so dispatch pipelining can't flatter the numbers — the same
  pitfall bench.py guards against).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


@dataclass
class Timing:
    compile_s: float
    mean_s: float
    reps: int

    def per_sec(self, items: int) -> float:
        return items / self.mean_s


def _materialize(out):
    return jax.tree_util.tree_map(
        lambda x: float(x.reshape(-1)[0]) if hasattr(x, "reshape") else x, out
    )


def time_fn(fn, *args, reps: int = 3, **kwargs) -> Timing:
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    _materialize(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
        _materialize(out)
    return Timing(compile_s=compile_s, mean_s=(time.perf_counter() - t0) / reps,
                  reps=reps)
