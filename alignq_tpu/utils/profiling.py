"""Profiling / tracing helpers.

The reference has no profiling (dead `time` imports, commented ptflops calls
— SURVEY.md section 5 tracing entry); TPU-native equivalent: the JAX
profiler (XLA trace viewer) plus XLA's own per-program cost analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA trace viewable in TensorBoard/Perfetto.

    Usage:
        with profiling.trace('/tmp/alignq_trace'):
            for _ in range(5):
                state, m = train_step(state, x, y)
            jax.block_until_ready(m['loss'])
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args) -> dict:
    """XLA's cost model for a jitted callable on example args: flops,
    bytes accessed, and the derived arithmetic intensity."""
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    flops = float(cost.get("flops", 0.0))
    byts = float(cost.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": byts,
        "arithmetic_intensity": flops / byts if byts else float("inf"),
    }


def measure_steady_state(fn: Callable, *args, iters: int = 20, warmup: int = 2) -> dict:
    """Wall-clock a jitted function: seconds/iter and achieved FLOP/s."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    sec = (time.perf_counter() - t0) / iters
    info = {"seconds_per_iter": sec}
    try:
        info["achieved_flops_per_sec"] = cost_analysis(fn, *args)["flops"] / sec
    except Exception:
        pass
    return info
