"""Headline benchmark: ResNet-20 CIFAR-10 quantized inference images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

The reference publishes no throughput numbers (fake-quant only, single GPU;
see BASELINE.md) — `vs_baseline` is therefore the fraction of the chip's
compute roofline achieved, normalized to the BASELINE.json north-star target
of 90% roofline (1.0 == target met). FLOPs are ANALYTIC (2*Kh*Kw*Cin*Cout*
Ho*Wo per conv, summed over the ResNet-20 topology), peak from the TPU
generation — XLA's cost-analysis FLOPs were tried and rejected: its count
exceeded the analytic one ~2.3x (it bills every op, padding included), which
inflated vs_baseline past the nominal int8 peak (round-1 VERDICT weak #5).

Uses the fastest available inference path: the Pallas fused int8 path when
present (alignq_tpu.kernels), else the bf16-MXU fake-quant path.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

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
    """Returns (name, jitted_fn, args, peak_flops)."""
    from alignq_tpu.models import resnet20_quant

    path = "bf16"
    try:
        from alignq_tpu.kernels import infer as qinfer  # int8 path, if present

        return ("int8", *qinfer.build_resnet20_int8(batch), PEAKS["int8"])
    except Exception:
        pass

    model = resnet20_quant(bitW=8, abitW=8, method="ours", mxu_dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False)

    return path, fwd, (variables, x), PEAKS["bf16"]


def main():
    batch = 1024
    path, fwd, args, peak = build_forward(batch)

    flops_total = resnet20_analytic_flops(batch)

    # Methodology note: async host dispatch pipelines with device compute,
    # so timing a burst of N calls and dividing measures steady-state
    # serving throughput. (An in-graph fori_loop variant was tried and
    # rejected: on this remote-TPU backend XLA's loop lowering serializes
    # the Pallas stages ~100x slower than the streamed dispatch path.)
    # Take the median of several bursts — tunnel latency is variable.
    jax.block_until_ready(fwd(*args))
    jax.block_until_ready(fwd(*args))

    iters, bursts = 30, 5
    samples = []
    for _ in range(bursts):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / iters)
    dt = sorted(samples)[len(samples) // 2]

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
