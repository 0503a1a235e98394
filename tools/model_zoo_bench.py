"""Honest-timing throughput sweep of every INT8 inference graph family.

Round-1/early-round-2 zoo numbers were block_until_ready dispatch-rate
artifacts (ARCHITECTURE.md methodology correction); this tool re-measures
each family's e2e int8 graph with the chained value-fetch protocol
(tools/honest_timing.py). Also sweeps the ResNet-20 batch size — bigger
batches amortize fixed per-launch overheads and fill the MXU M dimension.

Fast-stack coverage per family: the PreAct CIFAR ResNets (resnet20/56) get
a `_fast` row (poly act grid + int8 residual stream) because `stream='int8'`
is a property of the PreAct residual code stream (kernels/infer.py);
DenseNet-40 / MobileNetV2 / ResNet-50 have no equivalent stream knob, so
their fast row is poly-only — that asymmetry is structural, not an omission.

Prints one JSON line per row:
  {"name": "resnet20_b1024", "ms": ..., "imgs_per_sec": ...}

    timeout 3000 python tools/model_zoo_bench.py   # ambient env -> real TPU
    ... --families resnet20,mobilenetv2            # subset
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.honest_timing import measure  # noqa: E402


SMOKE = False


def _measure_forward(name, forward, qparams, x, results, n1=4, n2=16):
    def step(x):
        logits = forward(qparams, x)
        return x + jnp.mean(logits) * 1e-6

    if SMOKE:
        n1, n2 = 1, 2
    dt = measure(name, step, x, n1=n1, n2=n2, results=results, quiet=True,
                 reps=1 if SMOKE else 3)
    results[-1]["imgs_per_sec"] = round(x.shape[0] / dt, 1)
    print(json.dumps(results[-1]), flush=True)


def bench_resnet20(results, batches=(1024, 2048, 4096)):
    import functools

    from alignq_tpu.kernels.infer import build_resnet20_int8, resnet20_int8_forward

    for b in batches:
        _, (qp, x) = build_resnet20_int8(b)
        _measure_forward(f"resnet20_b{b}", resnet20_int8_forward, qp, x, results)
        _measure_forward(
            f"resnet20_poly_b{b}",
            functools.partial(resnet20_int8_forward, act_impl="poly"),
            qp, x, results,
        )
        _measure_forward(
            f"resnet20_fast_b{b}",
            functools.partial(resnet20_int8_forward, act_impl="poly", stream="int8"),
            qp, x, results,
        )


def bench_resnet20_w4a4(results, batch=2048):
    """W4A4 deployment rows (VERDICT r3 item 6): the flagship low-bit
    config's throughput story. Rows:
      - w4a4        — erf act grid (reference-exact semantics)
      - w4a4_bins   — direct bin-comparison act codes (15-entry A4 grid)
      - w4a4_fast   — bins + int8 residual stream (pairs with a
                      stream_int8=True QAT run; throughput is QAT-agnostic)
      - w4a4_packed — int4 nibble-packed kernels unpacked IN-GRAPH
                      (kernels/convert.py packed_int4_forward: weights live
                      packed in HBM, halving weight traffic at a small
                      unpack cost — resnet20 is activation-dominated so
                      this row mostly proves the cost is ~nil)
    """
    import functools

    from alignq_tpu.kernels.convert import pack_qparams_int4, packed_int4_forward
    from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
    from alignq_tpu.models import resnet20_quant

    model = resnet20_quant(bitW=4, abitW=4, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    qp = convert_resnet20(
        v["params"], v["batch_stats"], weight_bits=4, act_bits=4
    )
    _measure_forward(
        f"resnet20_w4a4_b{batch}",
        functools.partial(resnet20_int8_forward, act_bits=4),
        qp, x, results,
    )
    _measure_forward(
        f"resnet20_w4a4_bins_b{batch}",
        functools.partial(resnet20_int8_forward, act_bits=4, act_impl="bins"),
        qp, x, results,
    )
    # bins_int (round 5): the same A4 erf grid with the act sites run
    # entirely in the integer domain — per-channel int32 cutpoints on the
    # raw accumulator (infer.py act_int_cutpoints), no f32 act epilogue
    from alignq_tpu.kernels.infer import augment_int_cutpoints

    qpi = augment_int_cutpoints(qp, 4)
    _measure_forward(
        f"resnet20_w4a4_bins_int_b{batch}",
        functools.partial(
            resnet20_int8_forward, act_bits=4, act_impl="bins_int"
        ),
        qpi, x, results,
    )
    _measure_forward(
        f"resnet20_w4a4_fast_b{batch}",
        functools.partial(
            resnet20_int8_forward, act_bits=4, act_impl="bins", stream="int8"
        ),
        qp, x, results,
    )
    _measure_forward(
        f"resnet20_w4a4_bins_int_stream8_b{batch}",
        functools.partial(
            resnet20_int8_forward, act_bits=4, act_impl="bins_int",
            stream="int8",
        ),
        qpi, x, results,
    )
    packed = pack_qparams_int4(qp)
    _measure_forward(
        f"resnet20_w4a4_packed_b{batch}",
        functools.partial(
            packed_int4_forward, resnet20_int8_forward, act_bits=4,
            act_impl="bins",
        ),
        packed, x, results,
    )


def bench_resnet56(results, batch=1024):
    import functools

    from alignq_tpu.kernels.infer import convert_preact_resnet, resnet20_int8_forward
    from alignq_tpu.models import resnet56_quant

    model = resnet56_quant(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    qp = convert_preact_resnet(v["params"], v["batch_stats"])
    _measure_forward(f"resnet56_b{batch}", resnet20_int8_forward, qp, x, results)
    # fast-deploy stack (same depth-generic forward as resnet20)
    _measure_forward(
        f"resnet56_fast_b{batch}",
        functools.partial(resnet20_int8_forward, act_impl="poly", stream="int8"),
        qp, x, results,
    )


def bench_densenet40(results, batch=1024):
    from alignq_tpu.kernels.infer_densenet import (
        convert_densenet40,
        densenet40_int8_forward,
    )
    from alignq_tpu.models import densenet_40_quant

    model = densenet_40_quant(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    import functools

    qp = convert_densenet40(v["params"], v["batch_stats"])
    _measure_forward(f"densenet40_b{batch}", densenet40_int8_forward, qp, x, results)
    _measure_forward(
        f"densenet40_poly_b{batch}",
        functools.partial(densenet40_int8_forward, act_impl="poly"),
        qp, x, results,
    )
    # int8 stage buffer (VERDICT r3 item 1 / models/densenet.py stage_int8):
    # the growing per-stage feature map is stored as int8 codes, 4x less
    # HBM traffic on the 12 full-width bn+act re-reads per stage. Fresh-init
    # StageRequant calibration stats are fine for throughput (accuracy is
    # tools/export_int8.py --stage_int8's job: +0.00 pts measured).
    model_s = densenet_40_quant(
        bitW=8, abitW=8, method="ours", variant="int8",
        deploy_exact=True, stage_int8=True,
    )
    vs = model_s.init(jax.random.PRNGKey(1), x, train=False)
    qps = convert_densenet40(vs["params"], vs["batch_stats"], stage_int8=True)
    _measure_forward(
        f"densenet40_stage_int8_b{batch}",
        functools.partial(densenet40_int8_forward, stage_int8=True),
        qps, x, results,
    )
    _measure_forward(
        f"densenet40_stage_int8_poly_b{batch}",
        functools.partial(
            densenet40_int8_forward, stage_int8=True, act_impl="poly"
        ),
        qps, x, results,
    )


def bench_mobilenetv2(results, batch=1024):
    import functools

    from alignq_tpu.kernels.infer_mobilenet import (
        convert_mobilenetv2,
        mobilenetv2_int8_forward,
    )
    from alignq_tpu.models import mobile_v2

    model = mobile_v2(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    qp = convert_mobilenetv2(v["params"], v["batch_stats"])
    _measure_forward(f"mobilenetv2_b{batch}", mobilenetv2_int8_forward, qp, x, results)
    _measure_forward(
        f"mobilenetv2_poly_b{batch}",
        functools.partial(mobilenetv2_int8_forward, act_impl="poly"),
        qp, x, results,
    )
    # W4A4 row (VERDICT r3 item 6) — the README flagship low-bit width
    model4 = mobile_v2(bitW=4, abitW=4, method="ours")
    v4 = model4.init(jax.random.PRNGKey(1), x, train=False)
    qp4 = convert_mobilenetv2(
        v4["params"], v4["batch_stats"], weight_bits=4, act_bits=4
    )
    _measure_forward(
        f"mobilenetv2_w4a4_bins_b{batch}",
        functools.partial(mobilenetv2_int8_forward, act_bits=4, act_impl="bins"),
        qp4, x, results,
    )


def bench_resnet50(results, batch=128):
    import functools

    from alignq_tpu.kernels.infer_resnet_imagenet import (
        convert_resnet_imagenet,
        resnet_imagenet_int8_forward,
    )
    from alignq_tpu.models import resnet50_quant

    model = resnet50_quant(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(1), x, train=False)
    qp = convert_resnet_imagenet(v["params"], v["batch_stats"])
    _measure_forward(
        f"resnet50_b{batch}", resnet_imagenet_int8_forward, qp, x, results, n1=3, n2=9
    )
    _measure_forward(
        f"resnet50_poly_b{batch}",
        functools.partial(resnet_imagenet_int8_forward, act_impl="poly"),
        qp, x, results, n1=3, n2=9,
    )


FAMILIES = {
    "resnet20": bench_resnet20,
    "resnet20_w4a4": bench_resnet20_w4a4,
    "resnet56": bench_resnet56,
    "densenet40": bench_densenet40,
    "mobilenetv2": bench_mobilenetv2,
    "resnet50": bench_resnet50,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(FAMILIES))
    ap.add_argument("--smoke", action="store_true", help="tiny shapes (CPU check)")
    a = ap.parse_args()

    if a.smoke:  # correctness-of-the-tool check only; timings meaningless
        global SMOKE
        import functools

        SMOKE = True
        FAMILIES["resnet20"] = functools.partial(bench_resnet20, batches=(8,))
        for fn in (bench_resnet20_w4a4, bench_resnet56, bench_densenet40,
                   bench_mobilenetv2, bench_resnet50):
            FAMILIES[fn.__name__.replace("bench_", "")] = functools.partial(
                fn, batch=8 if fn is not bench_resnet50 else 2
            )

    results = []
    for fam in a.families.split(","):
        FAMILIES[fam.strip()](results)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
