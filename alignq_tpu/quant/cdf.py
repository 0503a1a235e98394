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


# Degree-15 odd minimax-fit polynomial for erf(z/sqrt2) on the clamped
# domain |z| <= 3 (Horner in z^2; fitted with endpoint-weighted lstsq).
# Accuracy: |err| <= 1.9e-6 in f32 == 2.4e-4 A8 code-units -> codes agree
# with the erf formulation for all but ~0.005% of N(0,1) inputs (values
# that close to a rounding boundary; measured in test_quant_core).
# p(3.0) = 0.99730 > 126.5/127, so the A8 clip saturates identically.
# Why it exists: the act-quant epilogue is the INT8 graph's largest cost
# (erf ablation: 2.83 -> 1.74 ms e2e at batch 1024, tools/int8_breakdown.py)
# and XLA's f32 erf spends ~25-30 VPU ops/element; the poly is ~11. Used
# identically in QAT and the INT graphs (cdf_impl='poly') so train==deploy
# stays bit-exact — it is a self-consistent alternative quantizer grid, NOT
# an approximation stacked on the erf grid.
ERF_SQRT2_POLY = (
    0.7978767035812473,
    -0.132937421134101,
    0.01987666573612765,
    -0.00232242597697477,
    2.0980537887739438e-4,
    -1.3852070586107547e-5,
    5.848221808977707e-7,
    -1.157208553963603e-8,
)


def erf_sqrt2(z: jax.Array, impl: str = "erf") -> jax.Array:
    """erf(z/sqrt2) == 2*Phi_{0,1}(z) - 1, the act-site CDF alignment map.

    impl='erf':  exact jax.lax.erf (reference semantics).
    impl='poly': the ERF_SQRT2_POLY grid (TPU fast path, ~2.5x fewer VPU ops).
    """
    if impl == "erf":
        return jax.lax.erf(z / _SQRT2)
    if impl == "poly":
        zc = jnp.clip(z, -3.0, 3.0)
        u = zc * zc
        acc = jnp.asarray(ERF_SQRT2_POLY[-1], z.dtype)
        for c in ERF_SQRT2_POLY[-2::-1]:
            acc = acc * u + c
        return zc * acc
    raise ValueError(f"unknown cdf impl {impl!r}")


def erf_grid_boundaries(g: int):
    """f32 decision boundaries of the erf act-quant grid.

    codes = round(erf(h/sqrt2) * g) is a monotone staircase, so
    code(h) >= k  iff  h >= t_k  with  t_k = sqrt2 * erfinv((k - 0.5) / g),
    k = 1..g (and by odd symmetry code(h) <= -k iff h <= -t_k). Computed
    host-side in float64 (scipy erfinv, torch fallback) and rounded once to
    f32 — at deploy time the act site becomes g compare+add pairs instead of
    an erf evaluation (kernels/infer.py _erfq_codes impl='bins'). Practical
    for the A4/A2 grids (g = 7 / 1); A8's g=127 stays on erf/poly.

    Exactness: the boundaries are exact for the TRUE erf, while the erf
    path evaluates XLA's few-ulp f32 erf and jnp.round (half-to-even); the
    two can disagree only for h within ~1 ulp of a boundary — measure-zero
    on real data, bounded in tests/test_bins_impl.py.
    """
    import numpy as np

    ks = (np.arange(1, g + 1, dtype=np.float64) - 0.5) / g
    try:
        from scipy.special import erfinv

        t = np.sqrt(2.0) * erfinv(ks)
    except Exception:  # pragma: no cover - scipy is present in this image
        import torch

        t = np.sqrt(2.0) * torch.erfinv(torch.from_numpy(ks)).numpy()
    return t.astype(np.float32)


def gaussian_cdf(x: jax.Array, mean, std, impl: str = "erf") -> jax.Array:
    """Phi_{mean,std}(x) via erf (reference: torch.distributions.Normal.cdf).

    The impl='erf' branch keeps the original fp association
    (z = (x-mean)/(std*sqrt2), then erf) — bit-parity tests and the
    deploy-exact QAT contract depend on reproducing those exact floats.
    """
    if impl == "erf":
        z = (x - mean) / (std * _SQRT2)
        return 0.5 * (1.0 + jax.lax.erf(z))
    return 0.5 * (1.0 + erf_sqrt2((x - mean) / std, impl))


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
    impl: str = "erf",
) -> Tuple[jax.Array, jax.Array]:
    """The reference `cdf.forward` for both formulations.

    affine=False  (variant a, quantization.py:45-50):   c = Phi(x) in [0, 1]
    affine=True   (variant b, admm quantization.py:49-58): c = 2*Phi(x) - 1,
                  and if act_range is given (activation source 'a'),
                  c = c * act_range *before* rounding.

    Returns (c, pdf) with pdf = 2*phi(x) in both variants.
    """
    c = gaussian_cdf(x, mean, std, impl)
    if affine:
        c = c * 2.0 - 1.0
        if act_range is not None:
            c = c * act_range
    pdf = gaussian_pdf2(x, mean, std)
    return c, pdf
