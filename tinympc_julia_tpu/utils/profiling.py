"""Profiling/observability helpers (SURVEY.md §5.1: the reference has almost
none — a stubbed micros() timer; here: jax.profiler traces + solve stats)."""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def solve_stats(solution) -> dict:
    """Convergence stats from a (batched) Solution."""
    iters = np.atleast_1d(np.asarray(solution.iter))
    solved = np.atleast_1d(np.asarray(solution.solved))
    return dict(
        n=int(iters.size),
        converged=int(solved.sum()),
        iter_mean=float(iters.mean()),
        iter_p50=float(np.percentile(iters, 50)),
        iter_p99=float(np.percentile(iters, 99)),
        iter_max=int(iters.max()),
    )


class Timer:
    """Wall-clock timer with device sync."""

    def __init__(self):
        self.t0 = None
        self.elapsed = None

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.elapsed = time.perf_counter() - self.t0


def timed(fn, *args, sync=True, **kw):
    """Run fn, block until ready, return (result, seconds)."""
    t0 = time.perf_counter()
    out = fn(*args, **kw)
    if sync:
        jax.block_until_ready(out)
    return out, time.perf_counter() - t0
