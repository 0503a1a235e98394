"""Straight-through-estimator rounding primitives.

Reference semantics: `uniform_quantize(k)` in
/root/reference/cdf_alignment/resnet-20-cifar-10/model/quantization.py:15-34 —
forward is k==32 -> identity, k==1 -> sign, else round(x*(2^k-1))/(2^k-1);
backward is identity (straight-through).

TPU-native design: instead of a custom autograd Function we use the
`x + stop_gradient(f(x) - x)` identity, which XLA fuses into the surrounding
elementwise graph (no custom-call boundary, stays on the VPU and fuses into
the MXU producers/consumers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def round_ste(x: jax.Array) -> jax.Array:
    """Round-to-nearest with an identity (straight-through) gradient."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def sign_ste(x: jax.Array) -> jax.Array:
    """Sign with an identity (straight-through) gradient (k=1 bit case)."""
    return x + jax.lax.stop_gradient(jnp.sign(x) - x)


def uniform_quantize(x: jax.Array, k: int, n: int | None = None) -> jax.Array:
    """k-bit uniform fake quantization with STE backward.

    Matches reference quantization.py:19-31: the rounding grid has
    n = 2^k - 1 steps over a unit interval; k is a static Python int so the
    branch resolves at trace time (no dynamic control flow under jit).

    n overrides the grid step count — e.g. n=127 trains on the exact
    symmetric-int8 deployment grid (the reference's n=255 over [-1,1] needs
    9 bits; SURVEY.md section 2.4.6), removing the train/deploy grid gap.
    """
    if k == 32:
        return x
    if k == 1:
        return sign_ste(x)
    n = float(n if n is not None else 2**k - 1)
    return round_ste(x * n) / n
