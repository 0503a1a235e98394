"""Pallas kernel: fused CDF-alignment quantization to int8.

Computes, in one VMEM pass (no HBM round-trips between the stages):
    c   = 2 * Phi_{0,1}(x) - 1        # erf on the VPU
    q   = round(c * 127)  in int8     # symmetric int8 grid

This is the activation-side half of the north-star fused path. The int grid
here is the INT-inference canonicalization of the reference's fake-quant
grid (SURVEY.md section 2.4.6): rounding the uniform variable on a 2^k-level
symmetric grid with the act_range scale folded into the dequant scale.
Reference transform: cdf_alignment_admm/.../quantization.py:49-59.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)


def interpret_mode() -> bool:
    """Pallas TPU kernels run in interpret mode on the CPU backend (tests)."""
    return jax.default_backend() == "cpu"


def _erf_approx(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7 — two orders
    below the int8 half-step 1/254). Pallas TPU has no erf primitive
    (Mosaic lowering raises NotImplementedError), so we build it from
    exp/mul/abs which the VPU has."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return sign * y


def _cdf_quant_kernel(x_ref, out_ref):
    x = x_ref[:]
    c = _erf_approx(x / _SQRT2)  # == 2*Phi(x) - 1
    q = jnp.clip(jnp.round(c * 127.0), -127.0, 127.0)
    out_ref[:] = q.astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("block_rows", "lanes"))
def cdf_quantize_int8(x: jax.Array, block_rows: int = 256, lanes: int = 1024) -> jax.Array:
    """Fused Phi-transform + int8 rounding; any shape float32 -> same-shape int8.

    The transform is elementwise, so we ignore the semantic shape entirely
    and stream a flat lane-aligned 2-D view through VMEM — NHWC activations
    often have tiny channel dims (3/16/32) that would waste 125/128 of the
    vector lanes if tiled on the channel axis. The dequant scale is the
    static 1/127 (times act_range at the consumer).
    """
    orig_shape = x.shape
    total = math.prod(orig_shape) if orig_shape else 1
    rows = pl.cdiv(total, lanes)
    flat = x.reshape(-1)
    pad_elems = rows * lanes - total
    if pad_elems:
        flat = jnp.pad(flat, (0, pad_elems))
    x2 = flat.reshape(rows, lanes)
    rb = min(block_rows, rows)
    row_pad = (-rows) % rb
    if row_pad:
        x2 = jnp.pad(x2, ((0, row_pad), (0, 0)))
    n_blocks = x2.shape[0] // rb

    out = pl.pallas_call(
        _cdf_quant_kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.int8),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((rb, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((rb, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret_mode(),
    )(x2)
    return out.reshape(-1)[:total].reshape(orig_shape)


def cdf_quantize_int8_reference(x: jax.Array) -> jax.Array:
    """Pure-jnp reference for testing the kernel."""
    c = jax.lax.erf(x / _SQRT2)
    return jnp.clip(jnp.round(c * 127.0), -127.0, 127.0).astype(jnp.int8)
