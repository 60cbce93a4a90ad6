"""Profiling and timing utilities.

The reference has zero instrumentation (SURVEY.md §5 — the only output is
``std::cout`` in main.cpp). Here timing is a first-class subsystem:

- ``timed`` / ``marginal_loop_time``: wall-clock helpers that synchronise
  through a scalar readback. On the tunneled TPU backend,
  ``block_until_ready`` returns before execution completes and each
  dispatch carries ~30 ms of relay latency, so honest per-iteration
  numbers must come from the marginal cost between two loop lengths —
  bench.py uses exactly this.
- ``trace``: context manager around ``jax.profiler`` for on-device traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


def readback(x) -> float:
    """Force completion by pulling one scalar to host."""
    return float(jnp.sum(jnp.real(jnp.ravel(x)[:1])))


def timed(fn, *args, reps: int = 5, warmup: int = 2):
    """Min wall-clock seconds of ``fn(*args)`` with readback sync."""
    for _ in range(warmup):
        readback(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        readback(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def marginal_loop_time(run, args=(), lo: int = 100, hi: int = 1100,
                       reps: int = 3) -> float:
    """Marginal seconds/iteration of ``run(*args, iters)``.

    Subtracts fixed dispatch latency by differencing two loop lengths.
    """
    readback(run(*args, lo))
    readback(run(*args, hi))
    t_lo, t_hi = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); readback(run(*args, lo)); t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); readback(run(*args, hi)); t_hi.append(time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (hi - lo), 1e-12)


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler`` trace around a code region (view with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a profiler trace."""
    with jax.profiler.TraceAnnotation(name):
        yield
