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


def headline_chain(fwd, n):
    """ONE jitted program: n data-dependent forwards of fwd(qargs, x).

    Each iteration perturbs x by a scalar derived from the previous
    forward's output, so the device can neither parallelize nor elide the
    chain. Shared by bench.py (the headline) and tools/headline_batch_ab.py
    (the batch sweep) — one implementation so the 'same protocol' claim
    holds by construction."""

    @jax.jit
    def prog(qargs, x):
        acc = 0.0
        for _ in range(n):
            out = fwd(qargs, x)
            s = jnp.mean(out) * 1e-6
            x = x + s  # next input depends on this forward's output
            acc = acc + s
        return acc

    return prog


def headline_timed_fetch(prog, qargs, x, reps=3):
    """Min wall time from dispatch to VALUE FETCH of the chain's scalar.

    Each rep uses a distinct (settled) input so the backend cannot serve a
    cached result for a repeated identical call."""
    _ = np.asarray(prog(qargs, x))  # compile + settle
    best = float("inf")
    for r in range(reps):
        xr = x + jnp.float32(r)
        _ = np.asarray(jnp.mean(xr))  # settle the input upload
        t0 = time.perf_counter()
        _ = np.asarray(prog(qargs, xr))
        best = min(best, time.perf_counter() - t0)
    return best


def headline_measure(fwd, qargs, x, n1=8, n2=40, reps=3):
    """Differenced chained measurement of fwd(qargs, x); returns dt (s)."""
    t1 = headline_timed_fetch(headline_chain(fwd, n1), qargs, x, reps)
    t2 = headline_timed_fetch(headline_chain(fwd, n2), qargs, x, reps)
    return (t2 - t1) / (n2 - n1)


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
