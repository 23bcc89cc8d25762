"""Profiling & analytic cost tools.

TPU upgrade over the reference's wall-clock-only tracing
(`data_utils.py:151-155`, SURVEY.md §5): `jax.profiler` trace capture for
xprof/tensorboard, per-function XLA cost analysis (FLOPs / bytes from the
compiled HLO), and a simple timing harness with honest `block_until_ready`.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace viewable in xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args: Any) -> dict[str, float]:
    """XLA's compiled cost model for `fn(*args)`: flops, bytes accessed,
    (per-kernel HLO cost roll-up)."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # one entry per device program
        costs = costs[0] if costs else {}
    return {k: float(v) for k, v in costs.items()
            if isinstance(v, (int, float))}


def timed(fn: Callable, *args: Any, iters: int = 3,
          warmup: int = 1) -> dict[str, float]:
    """Median wall time of fn(*args) with device sync (compiles first)."""
    for _ in range(max(warmup, 1)):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"median_s": times[len(times) // 2], "min_s": times[0],
            "max_s": times[-1], "iters": iters}


def flops_per_second(fn: Callable, *args: Any, iters: int = 3) -> dict[str, float]:
    """Achieved FLOP/s = XLA-modelled flops / measured median time."""
    costs = cost_analysis(fn, *args)
    t = timed(fn, *args, iters=iters)
    fl = costs.get("flops", 0.0)
    return {**t, "model_flops": fl,
            "achieved_tflops": fl / t["median_s"] / 1e12 if fl else 0.0,
            "bytes_accessed": costs.get("bytes accessed", 0.0)}
