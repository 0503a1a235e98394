"""Same-process A/B of INT8 ResNet-20 graph variants under honest timing.

Variants of `resnet20_int8_forward` (kernels/infer.py) measured with the
chained value-fetch protocol (tools/honest_timing.py), plus a value-fetched
bitwise-equality check between each variant and the baseline. Process-to-
process timing varies on this backend — only compare rows from ONE run.

    timeout 3000 python tools/ab_int8_variants.py   # ambient env -> real TPU
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.honest_timing import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    a = ap.parse_args()
    B = a.batch

    from bench import resnet20_analytic_flops
    from alignq_tpu.kernels.infer import build_resnet20_int8, resnet20_int8_forward

    _, (qparams, x0) = build_resnet20_int8(B)
    flops = resnet20_analytic_flops(B)

    variants = {
        "baseline": functools.partial(resnet20_int8_forward, fuse_skip=False),
        "fuse_skip": functools.partial(resnet20_int8_forward, fuse_skip=True),
        # NOT bitwise-equal to baseline by design: the poly is its own act
        # grid (pairs with QuantAct(cdf_impl='poly') in QAT); expect ~99.99%
        # per-site code agreement vs erf, lower e2e argmax agreement on
        # random-init nets (code flips compound through 21 sites)
        "poly_act": functools.partial(resnet20_int8_forward, act_impl="poly"),
        # int8-stored residual stream (shortcut reads requantized codes) —
        # different (trained) semantics, not bitwise-equal to baseline
        "poly_stream8": functools.partial(
            resnet20_int8_forward, act_impl="poly", stream="int8"
        ),
    }

    ref_logits = None
    results = []
    for name, fwd in variants.items():
        logits = np.asarray(fwd(qparams, x0[:64]))
        if ref_logits is None:
            ref_logits = logits
        else:
            print(json.dumps({
                "variant": name,
                "bitwise_equal_vs_baseline": bool(np.array_equal(ref_logits, logits)),
                "mad": float(np.abs(ref_logits - logits).mean()),
            }), flush=True)

        def step(x, fwd=fwd):
            logits = fwd(qparams, x)
            return x + jnp.mean(logits) * 1e-6

        measure(name, step, x0, flops=flops, results=results)

    base = next(r for r in results if r["name"] == "baseline")["ms"]
    for r in results:
        r["speedup_vs_baseline"] = round(base / r["ms"], 3)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
