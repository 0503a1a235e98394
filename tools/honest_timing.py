"""Shared honest-timing helpers for TPU measurement tools.

This backend's `jax.block_until_ready` does NOT wait for remote execution
(bench.py docstring; measured block 0.4 ms vs 15.3 s value fetch of the same
output). The only valid protocol: N data-dependent iterations inside ONE
jitted program, timed to an np.asarray VALUE FETCH of a scalar output,
differenced over two N to cancel RPC overhead. Validated at 428 TOPS ≈
nominal peak on a 4096^3 int8 matmul.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def chained(step, n):
    """ONE jitted program: n data-dependent applications of step(carry)."""

    @jax.jit
    def prog(carry):
        for _ in range(n):
            carry = step(carry)
        leaf = jax.tree_util.tree_leaves(carry)[0]
        return jnp.sum(leaf[(0,) * (leaf.ndim - 1)].astype(jnp.float32))

    return prog


def timed_fetch(prog, carry, reps=3):
    """Min wall time from dispatch to VALUE FETCH of the scalar output."""
    _ = np.asarray(prog(carry))  # compile + settle
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = np.asarray(prog(carry))
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, step, carry, n1=6, n2=30, flops=0.0, results=None, reps=3, quiet=False):
    """Differenced chained measurement; prints one JSON line; returns dt (s)."""
    t1 = timed_fetch(chained(step, n1), carry, reps)
    t2 = timed_fetch(chained(step, n2), carry, reps)
    dt = (t2 - t1) / (n2 - n1)
    rec = {"name": name, "ms": round(dt * 1e3, 4)}
    if flops:
        rec["tops"] = round(flops / dt / 1e12, 1)
    if not quiet:
        print(json.dumps(rec), flush=True)
    if results is not None:
        results.append(rec)
    return dt
