"""The 'bins' act-quant deploy impl (kernels/infer.py _erfq_codes).

Codes by direct comparison against the g exact erf-grid boundaries
(quant/cdf.py erf_grid_boundaries): t_k = sqrt2*erfinv((k-0.5)/g) in f64,
rounded once to f32. Unlike 'poly' this IS the reference erf grid — it
pairs with a standard erf-grid QAT run with no retraining; it can disagree
with the XLA-erf evaluation only for inputs within ~1 ulp of a boundary
(XLA's erf is itself a few-ulp approximation; jnp.round is half-to-even
while the comparison is half-up). a_bit <= 4 only (A8's g=127 would need
254 comparisons; it stays on erf/poly).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.kernels.infer import _erfq_codes
from alignq_tpu.quant.cdf import erf_grid_boundaries


class TestBoundaries:
    def test_boundaries_match_erf_inverse(self):
        # erf(t_k/sqrt2)*g == k - 0.5 by construction (f64 round-trip)
        for g in (7, 1, 15):
            t = erf_grid_boundaries(g).astype(np.float64)
            back = np.array([math.erf(tk / math.sqrt(2.0)) * g for tk in t])
            np.testing.assert_allclose(back, np.arange(1, g + 1) - 0.5, atol=1e-6)

    def test_boundaries_increasing(self):
        t = erf_grid_boundaries(7)
        assert np.all(np.diff(t) > 0)


class TestBinsCodes:
    @pytest.mark.parametrize("bits", [4, 2])
    def test_agreement_vs_erf_impl(self, bits):
        g = 2 ** (bits - 1) - 1
        h = jax.random.normal(jax.random.PRNGKey(0), (500_000,)) * 1.5
        ce = np.asarray(jax.jit(lambda h: _erfq_codes(h, bits, "erf"))(h))
        cb = np.asarray(jax.jit(lambda h: _erfq_codes(h, bits, "bins"))(h))
        assert ce.dtype == cb.dtype == np.int8
        assert cb.min() >= -g and cb.max() <= g
        frac = (ce != cb).mean()
        assert frac < 1e-5, frac  # only ~1-ulp boundary neighbours may differ

    def test_monotone_staircase(self):
        h = jnp.linspace(-4.0, 4.0, 100_001)
        cb = np.asarray(_erfq_codes(h, 4, "bins"))
        assert np.all(np.diff(cb.astype(int)) >= 0)
        assert cb[0] == -7 and cb[-1] == 7

    def test_exact_at_half_grid_values(self):
        # inputs exactly at code centers (erf(h/sqrt2)*g == k) must map to k
        g = 7
        t64 = [math.sqrt(2.0) * _erfinv(k / g) for k in range(-g + 1, g)]
        h = jnp.asarray(t64, jnp.float32)
        cb = np.asarray(_erfq_codes(h, 4, "bins"))
        np.testing.assert_array_equal(cb, np.arange(-g + 1, g))

    def test_a8_rejected(self):
        with pytest.raises(AssertionError):
            _erfq_codes(jnp.zeros((4,)), 8, "bins")


def _erfinv(y: float) -> float:
    try:
        from scipy.special import erfinv

        return float(erfinv(y))
    except Exception:  # pragma: no cover
        import torch

        return float(torch.erfinv(torch.tensor(y, dtype=torch.float64)))


class TestFamilyThreading:
    """act_impl reaches every family's deploy graph (smoke at A4)."""

    def test_resnet20_bins_runs(self):
        from alignq_tpu.kernels.infer import build_resnet20_int8, resnet20_int8_forward

        _, (qparams, x) = build_resnet20_int8(4)
        le = resnet20_int8_forward(qparams, x[:2], act_bits=4, act_impl="erf")
        lb = resnet20_int8_forward(qparams, x[:2], act_bits=4, act_impl="bins")
        assert le.shape == lb.shape
        # same grid -> same codes except 1-ulp boundary neighbours; on a
        # 2-image random-init net the logits should be near-identical
        assert np.mean(np.abs(np.asarray(le) - np.asarray(lb))) < 0.05
