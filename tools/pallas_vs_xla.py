"""Pallas vs XLA head-to-head on the INT8 ResNet-20 sites (VERDICT.md
round-1 item 4).

Per-site micro-benchmarks plus the end-to-end int8 graph with the 1x1
skip convs routed through the fused Pallas int8 matmul (kernels/qmatmul.py)
vs XLA's conv_general_dilated. Prints one JSON line per measurement; the
curated table lives in ARCHITECTURE.md.

TIMING CAVEAT: the burst timings here use block_until_ready, which this
backend does not honor (bench.py methodology note) — treat them ONLY as a
same-process relative A/B of identically-dispatched graphs, never as
absolute throughput. The e2e verdict (XLA 1.32x faster than Pallas-1x1)
was independently CONFIRMED under the honest value-fetch chained protocol
(ARCHITECTURE.md "honest performance picture" table); the bit-identity
check below fetches values and is always valid.

    python tools/pallas_vs_xla.py          # ambient env -> real TPU
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")


ITERS = 30
BURSTS = 5


def bench(fn, args, iters=None, bursts=None):
    iters = iters or ITERS
    bursts = bursts or BURSTS
    jax.block_until_ready(fn(*args))
    jax.block_until_ready(fn(*args))
    samples = []
    for _ in range(bursts):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) / iters)
    return sorted(samples)[len(samples) // 2]


def main():
    global ITERS, BURSTS
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--bursts", type=int, default=5)
    a = ap.parse_args()
    ITERS, BURSTS = a.iters, a.bursts

    from alignq_tpu.kernels.convert import QConvInt8
    from alignq_tpu.kernels.infer import (
        _int8_conv,
        _int8_conv_1x1_pallas,
        build_resnet20_int8,
        resnet20_int8_forward,
    )
    from alignq_tpu.kernels.qmatmul import int8_matmul_dequant

    batch = a.batch
    rng = np.random.RandomState(0)
    results = []

    def report(site, impl, dt, flops):
        rec = {
            "site": site, "impl": impl, "us": round(dt * 1e6, 1),
            "tops": round(flops / dt / 1e12, 2),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # --- 1x1 skip conv sites (stride 2) ---
    for site, (h, cin, cout) in {
        "skip_16x16_16to32": (16, 16, 32),
        "skip_8x8_32to64": (8, 32, 64),
    }.items():
        x8 = jnp.asarray(
            rng.randint(-127, 128, (batch, h * 2, h * 2, cin)), jnp.int8
        )
        q = QConvInt8(
            jnp.asarray(rng.randint(-127, 128, (1, 1, cin, cout)), jnp.int8),
            jnp.asarray(rng.rand(cout), jnp.float32),
            jnp.asarray(rng.rand(cout), jnp.float32),
        )
        flops = 2 * batch * h * h * cin * cout

        xla = jax.jit(lambda x, q: _int8_conv(x, q, 2, 0))
        pls = jax.jit(lambda x, q: _int8_conv_1x1_pallas(x, q, 2))
        np.testing.assert_allclose(
            np.asarray(xla(x8, q)), np.asarray(pls(x8, q)), rtol=1e-5
        )
        report(site, "xla_conv", bench(xla, (x8, q)), flops)
        report(site, "pallas_qmm", bench(pls, (x8, q)), flops)

    # --- dense-head-shaped matmul (B, 64) @ (64, 10) ---
    xf = jnp.asarray(rng.rand(batch, 64), jnp.float32)
    wf = jnp.asarray(rng.rand(64, 10), jnp.float32)
    bf = jnp.asarray(rng.rand(10), jnp.float32)
    x8h = jnp.asarray(rng.randint(-127, 128, (batch, 64)), jnp.int8)
    w8h = jnp.asarray(rng.randint(-127, 128, (64, 10)), jnp.int8)
    sh = jnp.asarray(rng.rand(10), jnp.float32)
    flops = 2 * batch * 64 * 10
    report("head_64x10", "xla_f32_dot",
           bench(jax.jit(lambda a, b, c: a @ b + c), (xf, wf, bf)), flops)
    report("head_64x10", "pallas_qmm",
           bench(jax.jit(lambda a, b, s, c: int8_matmul_dequant(a, b, s, c)),
                 (x8h, w8h, sh, bf)), flops)

    # --- end-to-end int8 graph, flag off/on ---
    fwd, (qparams, x) = build_resnet20_int8(batch)
    import functools

    fwd_pallas = jax.jit(
        functools.partial(resnet20_int8_forward, use_pallas_1x1=True)
    )
    # With the integer-code residual stream (kernels/infer.py) the two
    # graphs are bit-identical on hardware (measured e2e logit MAD 0.0):
    # every requant/add/relu is exact integer arithmetic, and the only f32
    # (conv epilogues) feeds erf-quantizers whose ties have measure zero.
    # Tolerate the theoretical 1-ulp erf-tie flip via argmax agreement, but
    # report the MAD so a regression to fusion-nondeterminism is visible.
    lx = np.asarray(fwd(qparams, x))
    lp = np.asarray(fwd_pallas(qparams, x))
    agree = float(np.mean(lx.argmax(-1) == lp.argmax(-1)))
    print(json.dumps({
        "e2e_argmax_agreement": round(agree, 4),
        "e2e_logit_mad": round(float(np.abs(lx - lp).mean()), 5),
    }), flush=True)
    assert agree >= 0.999, f"pallas-1x1 graph argmax agreement {agree}"
    from bench import resnet20_analytic_flops

    e2e_flops = resnet20_analytic_flops(batch)
    dt_x = bench(fwd, (qparams, x))
    dt_p = bench(fwd_pallas, (qparams, x))
    report("resnet20_e2e", "xla_conv_graph", dt_x, e2e_flops)
    report("resnet20_e2e", "pallas_1x1_graph", dt_p, e2e_flops)
    print(json.dumps({
        "e2e_images_per_sec_xla": round(batch / dt_x, 1),
        "e2e_images_per_sec_pallas_1x1": round(batch / dt_p, 1),
    }))


if __name__ == "__main__":
    main()
