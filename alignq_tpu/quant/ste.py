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

from functools import partial

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


# Trace-time dequantization mode: 'recip' (production default) or 'div'.
# 'div' exists for bit-level parity against the reference's literal
# `round(x*n)/n` (tools/reference_parity.py): the reciprocal multiply is
# <=1 ulp from IEEE division, and that ulp is LOAD-BEARING at the quantized
# grid's structural exact-zero ties (act_q1 == -shortcut residual
# cancellations), where it flips relu vjp masks — measured O(1e-2) gradient
# differences between two TORCH nets differing only in `/n` vs `*(1/n)`.
_DEQUANT_MODE = "recip"


class dequant_division:
    """Context manager: uniform_quantize dequantizes with true division
    (`/ n`), bit-matching the reference's grid values (quantization.py:29-31)
    in EAGER f64 execution. Parity-harness use only — the production 'recip'
    default is what keeps grid values bit-identical across jit/eager/fusion
    (see uniform_quantize's comment); division is IEEE-exact in eager but not
    under every XLA compilation."""

    def __enter__(self):
        global _DEQUANT_MODE
        self._prev = _DEQUANT_MODE
        _DEQUANT_MODE = "div"

    def __exit__(self, *exc):
        global _DEQUANT_MODE
        _DEQUANT_MODE = self._prev


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
    if _DEQUANT_MODE == "div":
        return round_ste(x * n) / n
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


def _requant_grid(
    x: jax.Array, act_scale: float, m: int, g: int, signed: bool = False
) -> jax.Array:
    k = jnp.round(x * (1.0 / act_scale)).astype(jnp.int32)
    c = jnp.clip((2 * k + m) // (2 * m), -g if signed else 0, g)
    return c.astype(x.dtype) * (m * act_scale)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def requant_grid_ste(
    x: jax.Array, act_scale: float, m: int, g: int, signed: bool = False
) -> jax.Array:
    """Deploy-exact residual requantization on an act-grid-aligned stream.

    The residual stream entering a ResNet block is a relu'd sum of act-grid
    values — exactly K*act_scale for an integer K >= 0 — and the INT graph
    requantizes it onto the block-input grid m*act_scale (m = bound /
    act_range, an integer; kernels/infer.py residual_multipliers). A float
    formulation round(x/scale) computes K/m +- ulp, and K/m lands EXACTLY on
    .5 rounding ties for even m (odd K): which side the fp error falls on
    depends on XLA's fusion choices, measured as ~26% fusion-dependent code
    flips on TPU (jit vs stepwise of the SAME graph). This instead recovers
    K exactly (the stream's fp error is << act_scale/2), requants in integer
    space with round-half-up c = (2K+m) // (2m) — bit-deterministic under
    any fusion, and bit-identical to the INT graph's _requant_codes — and
    returns c * (m*act_scale).

    Gradient: straight-through inside [0, g*m*act_scale], zero beyond the
    saturation bound (which the exact per-block bounds never reach).

    signed=True admits negative stream codes (MobileNet-V2 block outputs
    carry act_q3 with no trailing relu — kernels/infer_mobilenet.py
    _requant_codes(signed=True)): clip range becomes [-g, g] codes and the
    integer floor division (2K+m)//(2m) rounds half-up toward +inf for
    negative K too, matching the INT graph's tie side exactly.
    """
    return _requant_grid(x, act_scale, m, g, signed)


def _requant_grid_fwd(x, act_scale, m, g, signed):
    return _requant_grid(x, act_scale, m, g, signed), x


def _requant_grid_bwd(act_scale, m, g, signed, x, grad):
    lim = g * m * act_scale
    lo = -lim if signed else 0.0
    mask = (x >= lo) & (x <= lim)
    return (jnp.where(mask, grad, 0.0),)


requant_grid_ste.defvjp(_requant_grid_fwd, _requant_grid_bwd)


def requant_ste(x: jax.Array, scale, g: int) -> jax.Array:
    """Deploy-exact linear requantization fake-quant (STE).

    scale may be a Python float (static stem scale) or a traced per-channel
    vector broadcasting against x's last axis (calibrated stage-buffer
    scales, nn/layers.py StageRequant).

    Mirrors the INT inference graph's `_linear_q` stem-input site
    (kernels/infer.py): value = clip(round(x/scale), -g, g) * scale. Used by
    the deploy-exact QAT mode so training sees the stem-input requantization
    the deployed integer graph performs (the train!=deploy error source
    documented at kernels/infer.py:14-26). Safe here because the input is
    real image data — rounding ties have measure zero; grid-aligned residual
    streams must use `requant_grid_ste` instead (exact ties at every odd
    code for even m).

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
