"""Straight-through-estimator rounding primitives.

Reference semantics: `uniform_quantize(k)` in
/root/reference/cdf_alignment/resnet-20-cifar-10/model/quantization.py:15-34 —
forward is k==32 -> identity, k==1 -> sign, else round(x*(2^k-1))/(2^k-1);
backward is identity (straight-through).

TPU-native design: custom_vjp with an EXACT forward (`jnp.round(x)`), not the
`x + stop_gradient(round(x) - x)` additive identity. Both fuse equally well
under XLA (custom_vjp is a trace-time gradient rule, not a custom-call
boundary), but the additive identity's forward is `round(x) +- 1ulp`, and
that ulp noise is load-bearing: quantized residual adds produce exact-zero
ties (`act_q1 == -shortcut` on symmetric grids), where the relu vjp branch is
then decided by ulp noise that differs between XLA fusion orders — measured
O(1) jit-vs-eager gradient differences compounding with depth on ResNet-20.
The exact forward matches the reference's custom autograd Function
(quantization.py:19-31 returns torch.round directly) bit-for-bit, making
ties exact and the vjp branch deterministic everywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def round_ste(x: jax.Array) -> jax.Array:
    """Round-to-nearest with an identity (straight-through) gradient."""
    return jnp.round(x)


def _round_ste_fwd(x):
    return jnp.round(x), None


def _round_ste_bwd(_, g):
    return (g,)


round_ste.defvjp(_round_ste_fwd, _round_ste_bwd)


@jax.custom_vjp
def sign_ste(x: jax.Array) -> jax.Array:
    """Sign with an identity (straight-through) gradient (k=1 bit case)."""
    return jnp.sign(x)


def _sign_ste_fwd(x):
    return jnp.sign(x), None


def _sign_ste_bwd(_, g):
    return (g,)


sign_ste.defvjp(_sign_ste_fwd, _sign_ste_bwd)


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
    # Dequantize by multiplying with the trace-time reciprocal constant, NOT
    # `/ n`: XLA compiles division to a reciprocal-refinement sequence whose
    # result differs from IEEE division by 1 ulp for some operands AND differs
    # between jit and eager programs (measured on CPU at f64). Grid values
    # feed quantized residual adds whose exact-zero ties decide relu vjp
    # branches, so a 1-ulp wobble there flips O(1) gradient elements. A single
    # constant multiply is one correctly-rounded op in every execution mode —
    # bit-identical grid values under jit, eager, and any fusion. (≤1 ulp from
    # the reference's literal `round(x*n)/n`, quantization.py:29-31.)
    return round_ste(x * n) * (1.0 / n)


def requant_ste(x: jax.Array, scale: float, g: int) -> jax.Array:
    """Deploy-exact linear requantization fake-quant (STE).

    Mirrors the INT inference graph's `_linear_q` requant sites
    (kernels/infer.py): value = clip(round(x/scale), -g, g) * scale. Used by
    the deploy-exact QAT mode so training sees exactly the stem-input and
    residual-sum requantization the deployed integer graph performs (the
    train!=deploy error source documented at kernels/infer.py:14-26).

    Gradient: identity inside the clip range, 0 where saturated (the clip is
    an ordinary autodiff op on the continuous value; only the rounding is
    straight-through) — matches the reference's treatment of clipped
    quantizers (e.g. quantization_dorefa clamp) and avoids pushing params
    further into saturation. The boundary is equivalent to clip-after-round:
    round(clip(x)/s) == clip(round(x/s)) for |codes| capped at g.
    """
    lim = g * scale
    xc = jnp.clip(x, -lim, lim)
    return round_ste(xc * (1.0 / scale)) * scale
