"""AlignQ CDF-alignment fake quantizers for weights and activations.

Reference semantics:
- weight_quantize_fn:
  variant "a": /root/reference/cdf_alignment/resnet-20-cifar-10/model/quantization.py:52-78
      u = Phi_{mean(w), std(w)}(w);  wq = uniform_q(u) * 2 - 1
  variant "b" (canonical, stores cdf/pdf for the optimizer):
      /root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:61-85
      c = 2*Phi_{mean(w), std(w)}(w) - 1;  wq = uniform_q(c)
- activation_quantize_fn:
  variant "a": quantization.py:81-103:  u = Phi_{0,1}(a); aq = (uniform_q(u)*2-1)*act_range
  variant "b": admm quantization.py:88-132: c = (2*Phi_{0,1}(a)-1)*act_range; aq = uniform_q(c)

Both variants reach the same continuous map in the k->inf limit but place the
rounding grid differently (see SURVEY.md section 2.4.6); we implement both
exactly and select by `variant`.

The w_bit==32 / a_bit==32 paths short-circuit to identity at trace time
(static Python branch), matching reference quantization.py:64-67, 92-95.
"""

from __future__ import annotations

from typing import NamedTuple

import jax

from alignq_tpu.quant.cdf import cdf_transform, tensor_stats
from alignq_tpu.quant.ste import uniform_quantize


class WeightQuantResult(NamedTuple):
    """Quantized weight plus the CDF/PDF values the reference stores on the
    module (admm quantization.py:78) for the PDF-corrected optimizer step.

    In the functional design the optimizer recomputes cdf/pdf from the live
    params (optim/correction.py) — identical values since the update runs
    after the forward on unchanged params — so these fields exist for parity
    tests and introspection, not for plumbing."""

    wq: jax.Array
    cdf: jax.Array
    pdf: jax.Array


def quantize_weight(
    w: jax.Array,
    w_bit: int,
    *,
    variant: str = "b",
    grid_n: int | None = None,
    channelwise: bool = False,
) -> WeightQuantResult:
    """CDF-alignment fake-quantize a weight tensor.

    grid_n: override the rounding grid (e.g. 127 = symmetric-int8 deploy
    grid) — see quant/ste.py.
    channelwise: per-output-channel CDF statistics (beat-the-reference
    option; the reference is per-tensor, quantization.py:70)."""
    if w_bit == 32:
        return WeightQuantResult(w, w, w)
    # NOTE: the reference differentiates *through* the CDF transform —
    # only the rounding is straight-through (quantization.py:29-36), while
    # Phi_{mean(w),std(w)}(w) is an ordinary autograd subgraph including the
    # mean/std dependence on w. jnp.mean / jnp.std(ddof=1) are differentiable,
    # so no stop_gradient here; the effective d(wq)/dw matches.
    if channelwise:
        from alignq_tpu.quant.cdf import channel_stats

        mean, std = channel_stats(w)
    else:
        mean, std = tensor_stats(w)
    if variant == "a":
        c, pdf = cdf_transform(w, mean, std, affine=False)
        wq = uniform_quantize(c, w_bit, grid_n) * 2.0 - 1.0
    elif variant == "b":
        c, pdf = cdf_transform(w, mean, std, affine=True)
        wq = uniform_quantize(c, w_bit, grid_n)
    elif variant == "int8":
        # deployment-exact symmetric grid: round(c * (2^{k-1}-1)) — trains
        # on precisely the values the INT inference path can represent
        # (kernels/convert.py), eliminating the train/deploy grid gap
        c, pdf = cdf_transform(w, mean, std, affine=True)
        wq = uniform_quantize(c, w_bit, 2 ** (w_bit - 1) - 1)
    else:
        raise ValueError(f"unknown quantizer variant {variant!r}")
    return WeightQuantResult(wq, c, pdf)


def _act_c(a: jax.Array, variant: str, impl: str, act_range: float | None):
    """The continuous act-site transform c for a given variant/impl.

    The poly impl computes c = erf_sqrt2_poly(a) directly (2*Phi-1 with the
    N(0,1) prior IS erf(a/sqrt2)) — one fewer affine pair than going through
    Phi, and the exact expression the INT graphs' poly epilogue evaluates
    (kernels/infer.py _erfq_codes impl='poly'), keeping train==deploy
    bit-exact in poly mode."""
    from alignq_tpu.quant.cdf import erf_sqrt2

    if variant == "a":
        c, _ = cdf_transform(a, 0.0, 1.0, affine=False, impl=impl)
        return c
    c = erf_sqrt2(a, impl) if impl != "erf" else None
    if c is None:
        c, _ = cdf_transform(
            a, 0.0, 1.0, affine=True, act_range=act_range, impl=impl
        )
        return c
    return c * act_range if act_range is not None else c


def quantize_act(
    a: jax.Array,
    a_bit: int,
    *,
    act_range: float = 2.0,
    variant: str = "b",
    grid_n: int | None = None,
    impl: str = "erf",
) -> jax.Array:
    """CDF-alignment fake-quantize activations against a fixed N(0,1) prior.

    The N(0,1) prior assumes the input is post-BatchNorm (reference
    quantization.py:97, admm quantization.py:109). Returns the quantized
    activation; the CDF value feeding the ADMM correlation loss is computed
    by the caller (admm/correlation.py) so eval stays loss-free.

    impl='poly' swaps the erf for the ERF_SQRT2_POLY grid (quant/cdf.py) —
    the TPU fast path; must be paired with the same impl at deployment.
    """
    if a_bit == 32:
        return a
    if variant == "a":
        c = _act_c(a, "a", impl, None)
        return (uniform_quantize(c, a_bit, grid_n) * 2.0 - 1.0) * act_range
    elif variant == "b":
        c = _act_c(a, "b", impl, act_range)
        return uniform_quantize(c, a_bit, grid_n)
    elif variant == "int8":
        # act_range scaled OUTSIDE the rounding: value = act_range*code/127
        # with code = round((2*Phi-1) * 127) — the int8 act-site codes of
        # kernels/infer.py exactly
        c = _act_c(a, "int8", impl, None)
        return uniform_quantize(c, a_bit, 2 ** (a_bit - 1) - 1) * act_range
    raise ValueError(f"unknown quantizer variant {variant!r}")


def act_cdf(
    a: jax.Array, *, act_range: float = 2.0, variant: str = "b", impl: str = "erf"
) -> jax.Array:
    """The continuous CDF value of an activation tensor (pre-rounding).

    Used by the ADMM correlation path (admm quantization.py:109,116): the
    corr matrices compare x against its *continuous* transform, not the
    rounded value.
    """
    if variant == "a":
        return _act_c(a, "a", impl, None)
    # 'b' and 'int8' share the affine-scaled corr input
    return _act_c(a, "b", impl, act_range)
