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
    p.add_argument("--iters", type=int, default=20)
    a = p.parse_args()

    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.train import TrainConfig, create_train_state, make_train_step

    cfg = TrainConfig(train_batch_size=a.batch, bitW=8, abitW=8, admm=a.admm)
    model = resnet20_quant(
        bitW=8, abitW=8, method="ours", admm=a.admm,
        mxu_dtype=jnp.bfloat16 if a.bf16 else None,
    )
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg, input_shape=(1, 32, 32, 3),
        steps_per_epoch=391,
    )
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    x = jax.random.normal(jax.random.PRNGKey(1), (a.batch, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (a.batch,), 0, 10)

    state, m = step(state, x, y)  # compile + warmup
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(a.iters):
        state, m = step(state, x, y)
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / a.iters
    print(
        f"QAT train step (admm={a.admm}, bf16={a.bf16}, batch={a.batch}): "
        f"{a.batch/dt:,.0f} images/sec  ({dt*1e3:.2f} ms/step)"
    )


if __name__ == "__main__":
    main()
