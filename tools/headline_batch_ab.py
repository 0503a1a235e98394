"""Same-process batch-size A/B of the headline bench graph (fast stack).

Times the exact bench.py path (resnet20_int8_forward, act_impl='poly',
stream='int8') at batch 1024 vs 4096 with the chained value-fetch protocol
(bench.py docstring) to pick the headline batch. Same process, so the two
rows are comparable; run on the real chip (ambient axon env).

Usage: timeout 2400 python tools/headline_batch_ab.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench import resnet20_analytic_flops  # noqa: E402
from alignq_tpu.kernels import infer as qinfer  # noqa: E402


def measure(batch: int, n1: int = 8, n2: int = 40, reps: int = 3) -> float:
    _, (qparams, x) = qinfer.build_resnet20_int8(batch)

    def make_chain(n: int):
        @jax.jit
        def prog(qargs, x):
            acc = 0.0
            for _ in range(n):
                logits = qinfer.resnet20_int8_forward(
                    qargs, x, act_impl="poly", stream="int8"
                )
                s = jnp.mean(logits) * 1e-6
                x = x + s
                acc = acc + s
            return acc

        return prog

    def timed_fetch(prog) -> float:
        _ = np.asarray(prog(qparams, x))  # compile + settle
        best = float("inf")
        for r in range(reps):
            xr = x + jnp.float32(r)
            _ = np.asarray(jnp.mean(xr))
            t0 = time.perf_counter()
            _ = np.asarray(prog(qparams, xr))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed_fetch(make_chain(n1))
    t2 = timed_fetch(make_chain(n2))
    return (t2 - t1) / (n2 - n1)


def main():
    for batch in (1024, 2048, 4096):
        dt = measure(batch)
        tops = resnet20_analytic_flops(batch) / dt / 1e12
        print(
            json.dumps(
                {
                    "batch": batch,
                    "ms_per_fwd": round(dt * 1e3, 3),
                    "img_per_sec": round(batch / dt, 1),
                    "analytic_tops": round(tops, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
