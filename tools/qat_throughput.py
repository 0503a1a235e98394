"""Measure QAT train-step throughput on the current backend.

Fills the BASELINE.md throughput rows: images/sec for the jitted AlignQ
train step (forward + backward + corrected optimizer + ADMM duals in one
XLA program), ResNet-20 CIFAR-10 shapes.

    python tools/qat_throughput.py [--batch 1024] [--admm] [--bf16]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp


def main():
    sys.path.insert(0, "/root/repo")
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--admm", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--cdf_impl", choices=("erf", "poly"), default="erf")
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()

    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.train import TrainConfig, create_train_state, make_train_step

    cfg = TrainConfig(
        train_batch_size=a.batch, bitW=8, abitW=8, admm=a.admm,
        cdf_impl=a.cdf_impl,
    )
    model = resnet20_quant(
        bitW=8, abitW=8, method="ours", admm=a.admm, cdf_impl=a.cdf_impl,
        mxu_dtype=jnp.bfloat16 if a.bf16 else None,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg, input_shape=(1, 32, 32, 3),
        steps_per_epoch=391,
    )
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    x = jax.random.normal(jax.random.PRNGKey(1), (a.batch, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (a.batch,), 0, 10)

    import numpy as np

    # The step chain is data-dependent (state feeds back), so iterations
    # cannot overlap or be elided; the only timing trap left is the sync:
    # block_until_ready does NOT wait for remote execution on this backend
    # (bench.py methodology note) — time to an actual VALUE FETCH of the
    # last loss, and difference two iteration counts to cancel the RPC
    # overhead.
    state, m = step(state, x, y)  # compile + warmup
    _ = np.asarray(m["loss"])

    def run(n, s):
        # state is donated: thread it through and keep the updated one
        t0 = time.perf_counter()
        for _ in range(n):
            s, mm = step(s, x, y)
        _ = np.asarray(mm["loss"])
        return time.perf_counter() - t0, s

    n1, n2 = max(2, a.iters // 4), a.iters
    t1a, state = run(n1, state)
    t2a, state = run(n2, state)
    t1b, state = run(n1, state)
    t2b, state = run(n2, state)
    dt = (min(t2a, t2b) - min(t1a, t1b)) / (n2 - n1)
    print(
        f"QAT train step (admm={a.admm}, bf16={a.bf16}, batch={a.batch}): "
        f"{a.batch/dt:,.0f} images/sec  ({dt*1e3:.2f} ms/step, value-fetch timed)"
    )


if __name__ == "__main__":
    main()
