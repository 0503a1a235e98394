"""Headline benchmark: ResNet-20 CIFAR-10 quantized inference images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The reference publishes no throughput numbers (fake-quant only, single GPU;
see BASELINE.md) — `vs_baseline` is therefore the fraction of the chip's
compute roofline achieved, normalized to the BASELINE.json north-star target
of 90% roofline (1.0 == target met). FLOPs are ANALYTIC (2*Kh*Kw*Cin*Cout*
Ho*Wo per conv, summed over the ResNet-20 topology).

MEASUREMENT METHODOLOGY (round-2 correction — this invalidated every earlier
headline number):

On this remote-TPU backend (axon tunnel), `jax.block_until_ready` does NOT
wait for remote execution — measured: block returned in 0.4 ms while the
subsequent value fetch of the same output took 15.3 s. Every streamed-
dispatch timing built on block_until_ready therefore measured dispatch rate,
not compute: the round-1 "7.8–13.3M img/s" implied 2.3–21x the chip's
nominal 394 int8 TOPS, which is physically impossible for one chip.

Correct protocol, used here:
  1. ONE jitted program containing N data-dependent forwards (each input is
     perturbed by the previous output, so the device cannot parallelize or
     elide them).
  2. Time to an ACTUAL VALUE FETCH (np.asarray of the scalar output) — the
     only operation this backend is guaranteed to synchronize on.
  3. Run two program sizes N1 < N2 and difference: dt = (t2-t1)/(N2-N1),
     cancelling RPC/transfer overhead.
Validation: the same protocol on a 4096^3 int8 matmul measures 428 TOPS =
~109% of the nominal v5e peak (spec-level, as it must be); the earlier
block_until_ready numbers are unreproducible under it.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# per-chip peak (dense) — TPU v5e: 197 TFLOP/s bf16, 394 TOP/s int8
PEAKS = {"bf16": 197e12, "int8": 394e12}
TARGET_ROOFLINE_FRACTION = 0.90  # BASELINE.json north star


def resnet20_analytic_flops(batch: int) -> float:
    """2*Kh*Kw*Cin*Cout*Ho*Wo per conv over the PreAct ResNet-20 topology
    (stem 3x3x3x16@32x32; 3 stages of 3 blocks with two 3x3 convs each at
    16/32/64 channels and 32/16/8 spatial; 1x1 stride-2 skips at the two
    stage boundaries; 64x10 head)."""
    flops = 2 * 3 * 3 * 3 * 16 * 32 * 32  # stem
    in_c, hw = 16, 32
    for stage, c in enumerate((16, 32, 64)):
        for b in range(3):
            stride = 2 if (stage > 0 and b == 0) else 1
            if stride == 2:
                hw //= 2
                flops += 2 * 1 * 1 * in_c * c * hw * hw  # skip 1x1
            flops += 2 * 3 * 3 * in_c * c * hw * hw  # conv0
            flops += 2 * 3 * 3 * c * c * hw * hw  # conv1
            in_c = c
    flops += 2 * 64 * 10  # head
    return float(flops * batch)


def build_forward(batch: int):
    """Returns (name, step_fn(qargs..., x)->logits, args, peak_flops)."""
    from alignq_tpu.models import resnet20_quant

    try:
        from alignq_tpu.kernels import infer as qinfer  # int8 path, if present

        _, (qparams, x) = qinfer.build_resnet20_int8(batch)
        return ("int8", qinfer.resnet20_int8_forward, (qparams, x), PEAKS["int8"])
    except Exception:
        pass

    model = resnet20_quant(bitW=8, abitW=8, method="ours", mxu_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    return ("bf16", fwd, (variables, x), PEAKS["bf16"])


def make_chain(step_fn, n: int):
    """One jitted program: n data-dependent forwards (un-elidable,
    un-parallelizable), scalar output."""

    @jax.jit
    def prog(qargs, x):
        acc = 0.0
        for _ in range(n):
            logits = step_fn(qargs, x)
            s = jnp.mean(logits) * 1e-6
            x = x + s  # next input depends on this forward's output
            acc = acc + s
        return acc

    return prog


def timed_fetch(prog, qargs, x, reps: int = 3) -> float:
    """min wall time from dispatch to VALUE FETCH of the scalar output."""
    _ = np.asarray(prog(qargs, x))  # compile + settle
    best = float("inf")
    for r in range(reps):
        xr = x + jnp.float32(r)
        _ = np.asarray(jnp.mean(xr))  # settle the input upload
        t0 = time.perf_counter()
        _ = np.asarray(prog(qargs, xr))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batch = 1024
    path, step_fn, (qargs, x), peak = build_forward(batch)
    flops_total = resnet20_analytic_flops(batch)

    n1, n2 = 8, 40
    t1 = timed_fetch(make_chain(step_fn, n1), qargs, x)
    t2 = timed_fetch(make_chain(step_fn, n2), qargs, x)
    dt = (t2 - t1) / (n2 - n1)

    images_per_sec = batch / dt
    achieved_flops = flops_total / dt if flops_total else 0.0
    roofline_fraction = achieved_flops / peak if peak else 0.0

    print(
        json.dumps(
            {
                "metric": f"resnet20_cifar10_{path}_inference_images_per_sec_per_chip",
                "value": round(images_per_sec, 1),
                "unit": "images/sec",
                "vs_baseline": round(roofline_fraction / TARGET_ROOFLINE_FRACTION, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
