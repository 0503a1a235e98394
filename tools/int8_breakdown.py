"""Fine-grained timing breakdown of the INT8 ResNet-20 inference graph.

Locates where the e2e milliseconds go (conv MXU time vs erf act-quant VPU
time vs residual/requant stream traffic) so kernel-fusion work targets the
real bottleneck. All timings use the honest chained value-fetch protocol
(bench.py docstring): N data-dependent iterations inside ONE jitted
program, timed to an np.asarray VALUE FETCH, differenced over two N —
`jax.block_until_ready` does not synchronize on this backend.

Measurements (batch 1024 unless --batch):
  full            e2e int8 graph (the bench.py path)
  noerf           same graph with every erf act-quant replaced by a linear
                  rescale quantizer (same shapes/dtypes) -> erf cost by diff
  prefix:*        stem / +stage1 / +stage2 / full prefixes -> per-stage cost
  conv:*          each distinct conv shape in isolation (self-chained where
                  in/out shapes match, scalar-coupled otherwise; the `null`
                  row measures the scalar-coupling overhead to subtract)
  erf_site        standalone erf+round+clip traversal at the stage-1 tensor
                  shape, vs `mul_site` (same traversal, multiply instead of
                  erf) -> pure transcendental cost

    timeout 3000 python tools/int8_breakdown.py   # ambient env -> real TPU
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

# one shared implementation of the chained value-fetch protocol
from tools.honest_timing import measure  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    a = ap.parse_args()
    B = a.batch

    from alignq_tpu.kernels import infer
    from alignq_tpu.kernels.infer import (
        _erfq_codes,
        _int8_conv,
        _linear_q,
        _requant_codes,
        build_resnet20_int8,
        residual_multipliers,
        resnet20_int8_forward,
    )

    results = []
    fwd, (qparams, x0) = build_resnet20_int8(B)

    # --- full graph ---
    from bench import resnet20_analytic_flops

    e2e_flops = resnet20_analytic_flops(B)

    def full_step(x):
        logits = resnet20_int8_forward(qparams, x)
        return x + jnp.mean(logits) * 1e-6

    measure("full", full_step, x0, flops=e2e_flops, results=results)

    # --- noerf ablation: linear quantizer at every act site ---
    def _linq_codes(h, act_bits=8):
        g = 127.0
        return jnp.clip(jnp.round(h * 0.25), -g, g).astype(jnp.int8)

    def noerf_forward(qp, x):
        # same control flow as resnet20_int8_forward with _erfq_codes
        # swapped for a linear rescale (garbage values, identical op graph)
        g = 127.0
        ms = residual_multipliers(["skip" in blk for blk in qp["layers"]])
        h = _int8_conv(_linear_q(x, infer.S_IMG), qp["conv0"], 1, 1)
        out_c = jnp.maximum(_linq_codes(h).astype(jnp.int16), 0)
        for blk, m in zip(qp["layers"], ms):
            stride = 2 if "skip" in blk else 1
            x8 = _requant_codes(out_c, m, g)
            if "skip" in blk:
                sc_c = _linq_codes(_int8_conv(x8, blk["skip"], stride, 0)).astype(jnp.int16)
            else:
                sc_c = out_c
            h0 = _int8_conv(x8, blk["conv0"], stride, 1)
            r0 = jnp.maximum(_linq_codes(h0), 0)
            h1 = _int8_conv(r0.astype(jnp.int8), blk["conv1"], 1, 1)
            out_c = jnp.maximum(_linq_codes(h1).astype(jnp.int16) + sc_c, 0)
        feat = jnp.mean(out_c.astype(jnp.float32), axis=(1, 2)) * (2.0 / g)
        return feat @ qp["logit"]["kernel"] + qp["logit"]["bias"]

    def noerf_step(x):
        logits = noerf_forward(qparams, x)
        return x + jnp.mean(logits) * 1e-6

    measure("noerf", noerf_step, x0, flops=e2e_flops, results=results)

    # --- stage prefixes ---
    def prefix_forward(qp, x, upto):
        g = 127.0
        ms = residual_multipliers(["skip" in blk for blk in qp["layers"]])
        h = _int8_conv(_linear_q(x, infer.S_IMG), qp["conv0"], 1, 1)
        out_c = jnp.maximum(_erfq_codes(h).astype(jnp.int16), 0)
        for i, (blk, m) in enumerate(zip(qp["layers"], ms)):
            if i >= upto:
                break
            stride = 2 if "skip" in blk else 1
            x8 = _requant_codes(out_c, m, g)
            if "skip" in blk:
                sc_c = _erfq_codes(_int8_conv(x8, blk["skip"], stride, 0)).astype(jnp.int16)
            else:
                sc_c = out_c
            h0 = _int8_conv(x8, blk["conv0"], stride, 1)
            r0 = jnp.maximum(_erfq_codes(h0), 0)
            h1 = _int8_conv(r0.astype(jnp.int8), blk["conv1"], 1, 1)
            out_c = jnp.maximum(_erfq_codes(h1).astype(jnp.int16) + sc_c, 0)
        return out_c

    for name, upto in (("prefix:stem", 0), ("prefix:s1", 3), ("prefix:s2", 6), ("prefix:s3", 9)):
        def pstep(x, upto=upto):
            out_c = prefix_forward(qparams, x, upto)
            return x + jnp.sum(out_c[:2, 0, 0, :]).astype(jnp.float32) * 1e-9

        measure(name, pstep, x0, results=results)

    # --- isolated conv shapes ---
    rng = np.random.RandomState(0)

    def selfchain_conv(name, h, c, results):
        """c->c 3x3 conv at h*h spatial, output feeds next input."""
        w = jnp.asarray(rng.randint(-16, 16, (3, 3, c, c)), jnp.int8)
        x8 = jnp.asarray(rng.randint(-64, 64, (B, h, h, c)), jnp.int8)
        flops = 2 * 9 * c * c * h * h * B

        def step(x8):
            acc = jax.lax.conv_general_dilated(
                x8, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            return (acc & 63).astype(jnp.int8)

        measure(name, step, x8, flops=flops, results=results)

    def coupled_conv(name, hin, cin, cout, k, stride, pad, results):
        """scalar-coupled conv for shape-changing sites."""
        w = jnp.asarray(rng.randint(-16, 16, (k, k, cin, cout)), jnp.int8)
        x8 = jnp.asarray(rng.randint(-64, 64, (B, hin, hin, cin)), jnp.int8)
        hout = (hin + 2 * pad - k) // stride + 1
        flops = 2 * k * k * cin * cout * hout * hout * B

        def step(x8):
            acc = jax.lax.conv_general_dilated(
                x8, w, (stride, stride), [(pad, pad)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            s = (jnp.sum(acc) & 1).astype(jnp.int8)
            return x8 ^ s

        measure(name, step, x8, flops=flops, results=results)

    # null: the scalar-coupling traversal alone (to subtract from coupled_*)
    x8n = jnp.asarray(rng.randint(-64, 64, (B, 32, 32, 16)), jnp.int8)

    def null_step(x8):
        s = (jnp.sum(x8.astype(jnp.int32)) & 1).astype(jnp.int8)
        return x8 ^ s

    measure("null:couple_32x32x16", null_step, x8n, results=results)

    selfchain_conv("conv:s1_16c_32x32", 32, 16, results)
    selfchain_conv("conv:s2_32c_16x16", 16, 32, results)
    selfchain_conv("conv:s3_64c_8x8", 8, 64, results)
    coupled_conv("conv:stem_3to16_32x32", 32, 3, 16, 3, 1, 1, results)
    coupled_conv("conv:s2in_16to32_s2", 32, 16, 32, 3, 2, 1, results)
    coupled_conv("conv:s3in_32to64_s2", 16, 32, 64, 3, 2, 1, results)
    coupled_conv("conv:skip_16to32_1x1s2", 32, 16, 32, 1, 2, 0, results)
    coupled_conv("conv:skip_32to64_1x1s2", 16, 32, 64, 1, 2, 0, results)

    # --- erf site cost (stage-1 tensor shape) ---
    hf = jnp.asarray(rng.rand(B, 32, 32, 16) * 4 - 2, jnp.float32)

    def erf_step(h):
        c = jax.lax.erf(h * 0.7071)
        codes = jnp.clip(jnp.round(c * 127.0), -127, 127).astype(jnp.int8)
        return codes.astype(jnp.float32) * 1.01

    def mul_step(h):
        c = h * 0.7071
        codes = jnp.clip(jnp.round(c * 127.0), -127, 127).astype(jnp.int8)
        return codes.astype(jnp.float32) * 1.01

    measure("erf_site_32x32x16_f32", erf_step, hf, results=results)
    measure("mul_site_32x32x16_f32", mul_step, hf, results=results)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
