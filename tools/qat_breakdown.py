"""Same-process cost breakdown of the QAT train step (value-fetch timing).

Rows (one JSON line each; all same process so ratios are meaningful):
  fwd            eval forward only (no grad)
  grad           value_and_grad of the training loss (no optimizer)
  step           the full production train step (fwd+bwd+corrected SGD+BN)
  step_uniform   same step with method='uniform' (no CDF transform, no
                 PDF correction) — the combined cost of AlignQ's extra math
  step_f32       full step at Precision.HIGHEST (no bf16 MXU operands)

Reading: step - grad = optimizer + state plumbing; grad - ~3x-fwd-cost =
autodiff overhead beyond the FLOPs model; step_nocorr isolates the
PDF-correction's T(c)/sigma' recomputation cost.

    timeout 3000 python tools/qat_breakdown.py [--batch 1024]  # -> real TPU
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, "/root/repo")

from tools.honest_timing import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--cdf_impl", default="erf")
    a = ap.parse_args()

    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.train import TrainConfig, create_train_state, make_train_step

    def build(bf16=True, method="ours"):
        cfg = TrainConfig(
            train_batch_size=a.batch, bitW=8, abitW=8, cdf_impl=a.cdf_impl,
            mxu_bf16=bf16, method=method,
        )
        model = resnet20_quant(
            bitW=8, abitW=8, method=method, cdf_impl=a.cdf_impl,
            mxu_dtype=jnp.bfloat16 if bf16 else None,
        )
        state = create_train_state(
            jax.random.PRNGKey(0), model, cfg, input_shape=(1, 32, 32, 3),
            steps_per_epoch=391,
        )
        return cfg, model, state

    cfg, model, state = build()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (a.batch, 32, 32, 3))
    y0 = jax.random.randint(jax.random.PRNGKey(2), (a.batch,), 0, 10)

    results = []

    # fwd only (train-mode graph, no grad)
    def fwd_step(x):
        logits, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return x + jnp.mean(logits) * 1e-6

    measure("fwd", fwd_step, x0, n1=4, n2=16, results=results)

    # value_and_grad only
    def loss_fn(params, x):
        logits, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        return optax.softmax_cross_entropy_with_integer_labels(logits, y0).mean()

    vg = jax.value_and_grad(loss_fn)

    def grad_step(x):
        l, g = vg(state.params, x)
        # consume EVERY grad leaf: reading just one would let XLA prune the
        # other layers' weight-gradient contractions (~half the backward
        # FLOPs) out of the program
        gsum = sum(leaf.mean() for leaf in jax.tree_util.tree_leaves(g))
        return x + (l + gsum) * 1e-6

    measure("grad", grad_step, x0, n1=4, n2=16, results=results)

    # full production steps. Carry ordered (x, state): the chained()
    # timing wrapper reads the FIRST tree leaf of the carry as its output,
    # and TrainState's first leaf is the integer step counter — a
    # constant-foldable value that let XLA DCE the entire train step
    # (measured 0.016 ms "steps" before this fix). x + loss*1e-6 makes the
    # output depend on every step's forward+backward+optimizer chain.
    def make_full(cfgv, modelv, statev):
        step = make_train_step(modelv, cfgv)

        def full(carry):
            x, st = carry
            st2, metrics = step(st, x, y0)
            return (x + metrics["loss"] * 1e-6, st2)

        return full, (x0, statev)

    full, carry = make_full(cfg, model, state)
    measure("step", full, carry, n1=4, n2=16, results=results)

    cfg2, model2, state2 = build(method="uniform")
    full2, carry2 = make_full(cfg2, model2, state2)
    measure("step_uniform", full2, carry2, n1=4, n2=16, results=results)

    cfg3, model3, state3 = build(bf16=False)
    full3, carry3 = make_full(cfg3, model3, state3)
    measure("step_f32", full3, carry3, n1=4, n2=16, results=results)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
