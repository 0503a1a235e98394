"""Same-process A/B: DenseNet-40 INT8 concat vs preallocated-buffer stage.

The concat formulation re-copies the whole growing feature map every
block (O(n_blocks^2) bytes/stage); the prealloc variant
(infer_densenet.py _stage_prealloc) updates one full-width buffer in
place and zero-pads each block's BN/kernel over unwritten channels.
Value check first (integer-exact; f32 epilogues within 1 ulp), then
chained value-fetch timing.

    timeout 3000 python tools/densenet_prealloc_bench.py   # -> real TPU
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.honest_timing import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    a = ap.parse_args()

    from alignq_tpu.models import densenet
    from alignq_tpu.kernels.infer_densenet import (
        convert_densenet40,
        densenet40_int8_forward,
    )

    model = densenet.densenet_40_quant(bitW=8, abitW=8, method="ours")
    x0 = jax.random.normal(jax.random.PRNGKey(0), (a.batch, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(1), x0[:1], train=False)
    qp = convert_densenet40(v["params"], v["batch_stats"])

    variants = {
        "concat": functools.partial(densenet40_int8_forward, prealloc=False),
        "prealloc": functools.partial(densenet40_int8_forward, prealloc=True),
    }
    xs = x0[:64]
    l0 = np.asarray(jax.jit(variants["concat"])(qp, xs))
    l1 = np.asarray(jax.jit(variants["prealloc"])(qp, xs))
    print(json.dumps({
        "max_logit_diff": float(np.abs(l0 - l1).max()),
        "argmax_agreement": float((l0.argmax(-1) == l1.argmax(-1)).mean()),
    }), flush=True)

    results = []
    for name, fwd in variants.items():
        def step(x, fwd=fwd):
            return x + jnp.mean(fwd(qp, x)) * 1e-6

        measure(name, step, x0, n1=2, n2=8, results=results)
    base = results[0]["ms"]
    for r in results:
        r["speedup_vs_concat"] = round(base / r["ms"], 3)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
