"""Integer-domain act sites: act_impl='bins_int' (kernels/infer.py).

The VERDICT-r4 'integer-domain requant' candidate: fold each conv's
dequant+BN epilogue AND the A4/A2 erf-grid boundaries into per-channel
INT32 cutpoints on the raw MXU accumulator (act_int_cutpoints), so the
act site is g integer compare+add pairs — no f32 affine, no
transcendental, and no rounding-boundary tie hazard (the f32 'bins' path
can flip a code when the f32 evaluation of h = scale*acc + bias lands
within ~1 ulp of a boundary; the integer comparison has no such edge).

The strong oracle here is EXACTNESS: for any (scale, bias) — positive,
negative, or zero scale — the integer codes must equal the f64 evaluation
of the real-valued staircase on the same f32-rounded boundaries. That is
a bit-level contract, not an agreement rate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from alignq_tpu.kernels.convert import QConvInt8
from alignq_tpu.kernels.infer import (
    _int_bin_codes,
    act_int_cutpoints,
    augment_int_cutpoints,
    convert_preact_resnet,
    resnet20_int8_forward,
)
from alignq_tpu.quant.cdf import erf_grid_boundaries


def _ref_codes_f64(acc, scale, bias, g):
    """f64 evaluation of the bins staircase on the f32-rounded boundaries."""
    h = scale.astype(np.float64) * acc.astype(np.float64) + bias.astype(
        np.float64
    )
    codes = np.zeros(h.shape, np.int64)
    for tk in erf_grid_boundaries(g):
        tk = float(tk)
        codes += (h >= tk).astype(np.int64) - (h <= -tk).astype(np.int64)
    return codes


class TestCutpointExactness:
    @pytest.mark.parametrize("bits", [4, 2])
    def test_site_codes_exact_vs_f64(self, bits):
        g = 2 ** (bits - 1) - 1
        rng = np.random.RandomState(0)
        c = 16
        # scales spanning signs, magnitudes, and exact zero; biases large
        # enough to push some channels into constant-code degeneracy
        scale = np.concatenate([
            rng.uniform(1e-4, 1e-1, c - 6),
            -rng.uniform(1e-4, 1e-1, 3),
            [0.0, 0.0, 1e-8],
        ]).astype(np.float32)
        bias = np.concatenate([
            rng.uniform(-2, 2, c - 2), [5.0, -5.0]
        ]).astype(np.float32)
        q = QConvInt8(jnp.zeros((3, 3, 1, c), jnp.int8),
                      jnp.asarray(scale), jnp.asarray(bias))
        acc = rng.randint(-30000, 30000, (64, c)).astype(np.int32)
        cut = act_int_cutpoints(q, bits)
        got = np.asarray(_int_bin_codes(jnp.asarray(acc), cut))
        ref = _ref_codes_f64(acc, scale, bias, g)
        np.testing.assert_array_equal(got, ref)

    def test_boundary_accumulator_values(self):
        # walk acc one step across each cutpoint: code must flip exactly at
        # the cutpoint, never off-by-one
        bits, g = 4, 7
        scale = np.asarray([0.01], np.float32)
        bias = np.asarray([0.0], np.float32)
        q = QConvInt8(jnp.zeros((1, 1, 1, 1), jnp.int8),
                      jnp.asarray(scale), jnp.asarray(bias))
        cut = act_int_cutpoints(q, bits)
        t1 = np.asarray(cut["t1"])[:, 0]
        for k in range(g):
            below = jnp.asarray([[t1[k] - 1]], jnp.int32)
            at = jnp.asarray([[t1[k]]], jnp.int32)
            assert int(_int_bin_codes(below, cut)[0, 0]) == k
            assert int(_int_bin_codes(at, cut)[0, 0]) == k + 1

    def test_a8_rejected(self):
        q = QConvInt8(jnp.zeros((1, 1, 1, 4), jnp.int8),
                      jnp.ones((4,)), jnp.zeros((4,)))
        with pytest.raises(AssertionError):
            act_int_cutpoints(q, 8)


class TestEndToEnd:
    def _build(self, batch=2):
        import jax
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(bitW=4, abitW=4, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        qp = convert_preact_resnet(
            variables["params"], variables["batch_stats"],
            weight_bits=4, act_bits=4,
        )
        return qp, x

    def test_matches_bins_graph(self):
        qp, x = self._build()
        qpi = augment_int_cutpoints(qp, 4)
        lb = resnet20_int8_forward(qp, x, act_bits=4, act_impl="bins")
        li = resnet20_int8_forward(qpi, x, act_bits=4, act_impl="bins_int")
        # one grid realized two ways; differences only where the f32
        # epilogue of 'bins' rounds across a boundary the exact integer
        # comparison does not
        assert np.mean(np.abs(np.asarray(lb) - np.asarray(li))) < 0.05
        assert np.array_equal(
            np.argmax(np.asarray(lb), -1), np.argmax(np.asarray(li), -1)
        )

    def test_int8_stream_composes(self):
        qp, x = self._build()
        qpi = augment_int_cutpoints(qp, 4)
        lb = resnet20_int8_forward(
            qp, x, act_bits=4, act_impl="bins", stream="int8"
        )
        li = resnet20_int8_forward(
            qpi, x, act_bits=4, act_impl="bins_int", stream="int8"
        )
        assert np.isfinite(np.asarray(li)).all()
        assert np.mean(np.abs(np.asarray(lb) - np.asarray(li))) < 0.05

    def test_requires_augmentation(self):
        qp, x = self._build()
        with pytest.raises(AssertionError):
            resnet20_int8_forward(qp, x, act_bits=4, act_impl="bins_int")
