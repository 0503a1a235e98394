"""Gaussian CDF alignment transform.

Reference semantics: class `cdf` in
/root/reference/cdf_alignment/resnet-20-cifar-10/model/quantization.py:37-50
(variant "a": raw Phi(x) in [0,1]) and
/root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:41-59
(variant "b": affine 2*Phi(x)-1 in [-1,1], activations additionally scaled by
act_range *before* rounding). Both return `(cdf, pdf)` with pdf = 2*phi(x),
used by the PDF-corrected gradient rule (optim/correction.py).

TPU note: Phi is erf and phi is exp — pure VPU elementwise ops that XLA fuses
with the downstream rounding; no reason for a handwritten kernel in the QAT
(fake-quant) path. The int8 inference path fuses the same math into the Pallas
quantize kernels (kernels/quantize.py).
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def gaussian_cdf(x: jax.Array, mean, std) -> jax.Array:
    """Phi_{mean,std}(x) via erf (reference: torch.distributions.Normal.cdf)."""
    z = (x - mean) / (std * _SQRT2)
    return 0.5 * (1.0 + jax.lax.erf(z))


def gaussian_pdf2(x: jax.Array, mean, std) -> jax.Array:
    """2 * phi_{mean,std}(x) (reference quantization.py:49: exp(log_prob)*2)."""
    z = (x - mean) / std
    return 2.0 * _INV_SQRT_2PI * jnp.exp(-0.5 * z * z) / std


def tensor_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-tensor (mean, std) with Bessel correction.

    torch.std defaults to the unbiased (ddof=1) estimator
    (reference quantization.py:70: `torch.std(x)`), so we match ddof=1.
    """
    mean = jnp.mean(x)
    std = jnp.std(x, ddof=1)
    return mean, std


def channel_stats(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel (mean, std) for HWIO conv kernels (reduce all but
    the last axis, keepdims). NOT in the reference (per-tensor only,
    quantization.py:70) — a beat-the-reference accuracy option: the CDF fit
    is per-channel, so channels with different weight scales each get a
    well-matched Gaussian instead of sharing one."""
    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    std = jnp.std(x, axis=axes, ddof=1, keepdims=True)
    return mean, std


def cdf_transform(
    x: jax.Array,
    mean,
    std,
    *,
    affine: bool,
    act_range: float | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """The reference `cdf.forward` for both formulations.

    affine=False  (variant a, quantization.py:45-50):   c = Phi(x) in [0, 1]
    affine=True   (variant b, admm quantization.py:49-58): c = 2*Phi(x) - 1,
                  and if act_range is given (activation source 'a'),
                  c = c * act_range *before* rounding.

    Returns (c, pdf) with pdf = 2*phi(x) in both variants.
    """
    c = gaussian_cdf(x, mean, std)
    if affine:
        c = c * 2.0 - 1.0
        if act_range is not None:
            c = c * act_range
    pdf = gaussian_pdf2(x, mean, std)
    return c, pdf
