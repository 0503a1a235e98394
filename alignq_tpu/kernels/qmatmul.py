"""Pallas kernel: int8 x int8 -> int32 matmul with fused dequant epilogue.

One kernel does: MXU int8 matmul (int32 accumulate), then in the same VMEM
residency: scale (dequant), optional bias add, optional BatchNorm affine,
optional ReLU — the consumer-side half of the north-star fused path.
Replaces the reference's F.conv2d/F.linear call sites
(r20/model/quantization.py:119-120) on the INT inference path.

Tiling: (TM, TN) output tiles with the full K dimension resident (K is
small for these models: <= 4608 for 3x3x512 convs => <= 4.5 MB int8 per
operand tile at TM=128 — well under VMEM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignq_tpu.kernels.quantize import interpret_mode


def _qmm_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *, relu: bool):
    acc = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * scale_ref[:]  # per-column dequant scale
    y = y + bias_ref[:]
    if relu:
        y = jnp.maximum(y, 0.0)
    out_ref[:] = y


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("relu", "tm", "tn"))
def int8_matmul_dequant(
    x: jax.Array,  # (M, K) int8
    w: jax.Array,  # (K, N) int8
    scale: jax.Array,  # (N,) f32 — combined act*weight dequant scale per out-col
    bias: jax.Array | None = None,  # (N,) f32 — fused bias / BN shift
    relu: bool = False,
    tm: int = 256,
    tn: int = 256,
) -> jax.Array:
    """y[M, N] = relu?( (x @ w) * scale + bias )"""
    m, k = x.shape
    k2, n = w.shape
    assert k == k2
    if bias is None:
        bias = jnp.zeros((n,), jnp.float32)

    # pad to hardware tiles: int8 wants (32, 128) min tiles
    mp, kp, np_ = _round_up(m, 32), _round_up(k, 128), _round_up(n, 128)
    tm = min(tm, mp)
    tn = min(tn, np_)
    mp, np_ = _round_up(mp, tm), _round_up(np_, tn)
    xp = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    wp = jnp.pad(w, ((0, kp - k), (0, np_ - n)))
    sp = jnp.pad(scale, (0, np_ - n)).reshape(1, np_)
    bp = jnp.pad(bias, (0, np_ - n)).reshape(1, np_)

    grid = (mp // tm, np_ // tn)
    out = pl.pallas_call(
        functools.partial(_qmm_kernel, relu=relu),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, kp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=mp * kp + kp * np_ + 4 * mp * np_,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(xp, wp, sp, bp)
    return out[:m, :n]


def int8_matmul_dequant_reference(x, w, scale, bias=None, relu=False):
    """Pure-jnp reference for testing."""
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    y = acc.astype(jnp.float32) * scale.reshape(1, -1)
    if bias is not None:
        y = y + bias.reshape(1, -1)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y
