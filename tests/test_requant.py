"""Deterministic integer residual requantization (train == deploy, and
deploy == deploy under any XLA fusion).

Background: the INT graph's residual stream values are exact multiples of
act_scale, so the block-input requant ratio K/m lands exactly on .5 rounding
ties for even m — a float round(x/scale) there is fusion-nondeterministic
(measured ~26% code flips between jit and stepwise execution of the SAME
XLA graph on TPU). kernels/infer.py therefore carries the stream as integer
codes and requantizes with round-half-up integer arithmetic; the
deploy-exact QAT mode (quant/ste.py requant_grid_ste) reproduces it
code-for-code on the float fake-quant stream.
"""

import math
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.kernels.infer import (
    _requant_codes,
    residual_bounds,
    residual_multipliers,
)
from alignq_tpu.quant.ste import requant_grid_ste

RESNET20_SKIPS = [False, False, False, True, False, False, True, False, False]


class TestResidualMultipliers:
    def test_resnet20_pattern(self):
        assert residual_multipliers(RESNET20_SKIPS) == [1, 2, 3, 4, 2, 3, 4, 2, 3]
        assert residual_bounds(RESNET20_SKIPS) == [2, 4, 6, 8, 4, 6, 8, 4, 6]

    def test_resnet56_pattern(self):
        skips = [False] * 9 + [True] + [False] * 8 + [True] + [False] * 8
        ms = residual_multipliers(skips)
        assert ms[:9] == list(range(1, 10))  # stage 1 grows by 1 per block
        assert ms[9] == 10 and ms[10] == 2  # stride block resets to 2
        assert ms[18] == 10 and ms[19] == 2


class TestRequantCodes:
    @pytest.mark.parametrize("m", [1, 2, 3, 4, 10])
    def test_round_half_up_exact(self, m):
        # independent exact-rational reference: floor(K/m + 1/2), clip to g
        k = np.arange(0, 128 * m + 5)
        want = np.minimum(
            [math.floor(Fraction(int(kk), m) + Fraction(1, 2)) for kk in k], 127
        )
        got = np.asarray(_requant_codes(jnp.asarray(k, jnp.int32), m, 127.0))
        np.testing.assert_array_equal(got, np.asarray(want, np.int8))
        assert got.dtype == np.int8

    def test_m1_lossless(self):
        k = jnp.arange(0, 128, dtype=jnp.int32)
        got = np.asarray(_requant_codes(k, 1, 127.0))
        np.testing.assert_array_equal(got, np.arange(0, 128).clip(0, 127))

    def test_jit_eager_identical(self):
        # integer arithmetic: bit-identical under any compilation
        k = jnp.asarray(np.random.RandomState(0).randint(0, 509, 4096), jnp.int32)
        for m in (2, 3, 4):
            eager = np.asarray(_requant_codes(k, m, 127.0))
            jitted = np.asarray(jax.jit(_requant_codes, static_argnums=(1, 2))(k, m, 127.0))
            np.testing.assert_array_equal(eager, jitted)


class TestSignedRequant:
    @pytest.mark.parametrize("m", [1, 2])
    def test_signed_half_up_exact(self, m):
        """MobileNet block outputs have no trailing relu: negative codes must
        round half-up toward +inf, matching integer floor division."""
        k = np.arange(-130 * m, 260 * m)
        want = np.clip(
            [math.floor(Fraction(int(kk), m) + Fraction(1, 2)) for kk in k],
            -127, 127,
        )
        got = np.asarray(
            _requant_codes(jnp.asarray(k, jnp.int32), m, 127.0, signed=True)
        )
        np.testing.assert_array_equal(got, np.asarray(want, np.int8))

    def test_dynamic_codes_matches_float_formula_off_ties(self):
        """_dynamic_q_codes == _dynamic_q on the same grid values wherever the
        ratio is NOT a .5 tie; at the ties it is the deterministic half-up."""
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            _dynamic_q,
            _dynamic_q_codes,
        )

        act_scale = 2.0 / 127.0
        k = np.concatenate([np.arange(-254, 255), [254]])  # kmax = 254: odd K all tie
        cq, sq = _dynamic_q_codes(jnp.asarray(k, jnp.int32), act_scale)
        cf, sf = _dynamic_q(jnp.asarray(k * act_scale, jnp.float32))
        np.testing.assert_allclose(float(sq), float(sf), rtol=1e-6)
        ties = (127 * np.abs(k)) % 254 == 127
        np.testing.assert_array_equal(
            np.asarray(cq)[~ties], np.asarray(cf)[~ties]
        )
        # ties: exact half-up of 127*K/254 = K/2
        want_ties = np.asarray(
            [math.floor(Fraction(int(kk), 2) + Fraction(1, 2)) for kk in k[ties]]
        )
        np.testing.assert_array_equal(np.asarray(cq)[ties], want_ties)


class TestRequantGridSTESigned:
    @pytest.mark.parametrize("g", [127, 7])
    def test_signed_codes_match_int_graph(self, g):
        """The MobileNet deploy-exact QAT site and the INT graph's signed
        requant round identical codes from the grid-aligned stream (which
        carries NEGATIVE codes: act_q3 has no trailing relu)."""
        m = 2
        act_scale = 2.0 / g
        k = np.arange(-g - 3, 2 * g + 4)
        x = jnp.asarray(
            (k.astype(np.float32) * np.float32(1.0 / g)) * np.float32(2.0)
        )
        y = requant_grid_ste(x, act_scale, m, g, True)
        got = np.asarray(jnp.round(y / (m * act_scale))).astype(np.int8)
        want = np.asarray(
            _requant_codes(jnp.asarray(k, jnp.int32), m, float(g), signed=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_signed_gradient_mask(self):
        g, m = 7, 2
        act_scale = 2.0 / 7
        lim = g * m * act_scale
        x = jnp.asarray([-lim - 0.5, -lim + 0.01, -0.5, 0.5, lim - 0.01, lim + 0.5])
        grads = jax.grad(
            lambda v: requant_grid_ste(v, act_scale, m, g, True).sum()
        )(x)
        np.testing.assert_array_equal(np.asarray(grads), [0, 1, 1, 1, 1, 0])


class TestRequantGridSTE:
    @pytest.mark.parametrize("g", [127, 7])
    @pytest.mark.parametrize("m", [1, 2, 3, 4])
    def test_codes_match_int_graph(self, m, g):
        """The QAT fake-quant site and the INT graph round identical codes
        from the grid-aligned float stream the training graph actually
        produces (value = (round(c*g)*(1/g)) * act_range, fake_quant.py
        'int8' variant)."""
        act_scale = 2.0 / g
        k = np.arange(0, m * g + 5)
        # emulate the training-graph value construction (two fp multiplies)
        x = jnp.asarray(
            (k.astype(np.float32) * np.float32(1.0 / g)) * np.float32(2.0)
        )
        y = requant_grid_ste(x, act_scale, m, g)
        got = np.asarray(jnp.round(y / (m * act_scale))).astype(np.int8)
        want = np.asarray(_requant_codes(jnp.asarray(k, jnp.int32), m, float(g)))
        np.testing.assert_array_equal(got, want)

    def test_values_on_block_grid(self):
        g, m = 127, 3
        act_scale = 2.0 / g
        x = jnp.asarray(np.arange(0, m * g + 1) * act_scale, jnp.float32)
        y = np.asarray(requant_grid_ste(x, act_scale, m, g))
        scale = m * act_scale
        codes = y.astype(np.float64) / scale
        # y is the f32 rendering of integer_code * scale: on-grid to f32 ulps
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
        assert round(codes.max()) <= g

    def test_gradient_ste_with_saturation(self):
        g, m = 7, 2
        act_scale = 2.0 / 7
        lim = g * m * act_scale
        x = jnp.asarray([0.0, 0.5, 1.0, lim - 0.01, lim + 0.5], jnp.float32)
        grads = jax.grad(lambda v: requant_grid_ste(v, act_scale, m, g).sum())(x)
        np.testing.assert_array_equal(np.asarray(grads), [1, 1, 1, 1, 0])


@pytest.mark.slow
class TestDeployExactParity:
    def test_deploy_exact_model_matches_int_graph(self):
        """Random-init deploy-exact QAT forward vs the INT graph: the requant
        sites now agree code-for-code, so disagreement is bounded by the f32
        conv-vs-int-conv epilogue ulps (measure-zero erf ties)."""
        from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(
            bitW=8, abitW=8, method="ours", variant="int8", deploy_exact=True
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(4), x, train=False)
        logits_fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_resnet20(variables["params"], variables["batch_stats"])
        logits_i8 = np.asarray(resnet20_int8_forward(qp, x))
        agree = (logits_fq.argmax(-1) == logits_i8.argmax(-1)).mean()
        assert agree >= 0.9

    def test_deploy_exact_mobilenet_matches_int_graph(self):
        """MobileNetV2 deploy-exact QAT (stem S_IMG requant + signed m=2
        block-edge requants) vs the INT graph at W4A4 — the width where the
        requant sites matter. Structural check at random init; the trained
        validation is tools/export_int8.py --model mobilenetv2 --bits 4
        --deploy_exact (PARITY.md)."""
        from alignq_tpu.kernels.infer_mobilenet import (
            convert_mobilenetv2,
            mobilenetv2_int8_forward,
        )
        from alignq_tpu.models import mobile_v2

        model = mobile_v2(
            bitW=4, abitW=4, method="ours", variant="int8", deploy_exact=True
        )
        x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(6), x, train=False)
        logits_fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_mobilenetv2(
            variables["params"], variables["batch_stats"],
            weight_bits=4, act_bits=4,
        )
        logits_i8 = np.asarray(mobilenetv2_int8_forward(qp, x, act_bits=4))
        agree = (logits_fq.argmax(-1) == logits_i8.argmax(-1)).mean()
        assert agree >= 0.9

    def test_deploy_exact_densenet_matches_int_graph(self):
        """DenseNet-40 deploy-exact QAT (stem-only site — pre-activation has
        no residual requants) vs the INT graph at W4A4."""
        from alignq_tpu.kernels.infer_densenet import (
            convert_densenet40,
            densenet40_int8_forward,
        )
        from alignq_tpu.models import densenet_40_quant

        model = densenet_40_quant(
            bitW=4, abitW=4, method="ours", variant="int8", deploy_exact=True
        )
        x = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(8), x, train=False)
        logits_fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_densenet40(
            variables["params"], variables["batch_stats"],
            weight_bits=4, act_bits=4,
        )
        logits_i8 = np.asarray(densenet40_int8_forward(qp, x, act_bits=4))
        agree = (logits_fq.argmax(-1) == logits_i8.argmax(-1)).mean()
        assert agree >= 0.9
