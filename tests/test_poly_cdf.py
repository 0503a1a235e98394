"""The ERF_SQRT2_POLY fast act-quantizer grid (quant/cdf.py erf_sqrt2).

The poly is a self-consistent alternative to the erf CDF: used identically
in QAT (QuantAct(cdf_impl='poly')) and the INT graphs
(resnet20_int8_forward(act_impl='poly')), train == deploy stays exact;
against the erf grid it agrees on all but ~0.01% of codes (N(0,1) inputs
that land within the poly's 1.9e-6 error of a rounding boundary).

Motivation (tools/int8_breakdown.py on hardware): the erf epilogues are the
INT8 graph's single largest cost — e2e 2.83 ms with erf vs 1.74 ms with the
act transform ablated (batch 1024). XLA's f32 erf spends ~25-30 VPU
ops/element; the degree-15 odd Horner spends ~11.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.quant.cdf import erf_sqrt2
from alignq_tpu.quant.fake_quant import quantize_act


class TestPolyGrid:
    def test_code_agreement_vs_erf(self):
        h = jax.random.normal(jax.random.PRNGKey(0), (500_000,))
        ce = np.asarray(erf_sqrt2(h, "erf"))
        cp = np.asarray(erf_sqrt2(h, "poly"))
        for g in (127.0, 7.0):  # A8, A4
            agree = (
                np.clip(np.round(ce * g), -g, g)
                == np.clip(np.round(cp * g), -g, g)
            ).mean()
            assert agree >= 0.999, (g, agree)

    def test_accuracy_inside_clamp(self):
        # |err| <= ~2e-6 on the clamped domain |h| <= 3
        h = jnp.linspace(-3.0, 3.0, 100_001)
        err = np.abs(np.asarray(erf_sqrt2(h, "poly")) - np.asarray(erf_sqrt2(h, "erf")))
        assert err.max() < 5e-6

    def test_tail_saturates_all_grids(self):
        # p(3.0) = 0.99730 must exceed the top rounding boundary of every
        # supported act grid so the clamp emits the saturated code
        h = jnp.asarray([3.0, 4.0, 10.0, -3.0, -10.0])
        c = np.asarray(erf_sqrt2(h, "poly"))
        for g in (127, 7):
            codes = np.round(c * g)
            np.testing.assert_array_equal(codes, [g, g, g, -g, -g])

    def test_codes_monotone(self):
        h = jnp.linspace(-4.0, 4.0, 200_001)
        codes = np.round(np.asarray(erf_sqrt2(h, "poly")) * 127)
        assert (np.diff(codes) >= 0).all()

    def test_gradient_finite_and_matches_pdf_shape(self):
        # d/dh erf(h/sqrt2) = sqrt(2/pi) exp(-h^2/2); the poly's autodiff
        # derivative must track it inside the clamp and be 0 outside
        h = jnp.linspace(-2.5, 2.5, 101)
        gp = np.asarray(jax.vmap(jax.grad(lambda v: erf_sqrt2(v, "poly")))(h))
        want = np.sqrt(2 / np.pi) * np.exp(-np.asarray(h) ** 2 / 2)
        np.testing.assert_allclose(gp, want, atol=2e-4)
        g_out = jax.grad(lambda v: erf_sqrt2(v, "poly"))(jnp.float32(3.5))
        assert float(g_out) == 0.0

    def test_unknown_impl_raises(self):
        with pytest.raises(ValueError):
            erf_sqrt2(jnp.zeros(3), "spline")


class TestPolyActQuant:
    def test_quantize_act_poly_values_on_grid(self):
        a = jax.random.normal(jax.random.PRNGKey(1), (1000,))
        y = np.asarray(quantize_act(a, 8, variant="int8", impl="poly"))
        act_scale = 2.0 / 127.0
        codes = y / act_scale
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
        assert np.abs(codes).max() <= 127

    def test_qat_matches_int_graph_codes(self):
        """The QAT poly act site and the INT graph's poly epilogue must round
        IDENTICAL codes from the same pre-activation values — the poly-mode
        train==deploy contract."""
        from alignq_tpu.kernels.infer import _erfq_codes

        h = jax.random.normal(jax.random.PRNGKey(2), (4096,)) * 1.5
        y = np.asarray(quantize_act(h, 8, variant="int8", impl="poly"))
        qat_codes = np.round(y / (2.0 / 127.0)).astype(np.int8)
        int_codes = np.asarray(_erfq_codes(h, 8, "poly"))
        np.testing.assert_array_equal(qat_codes, int_codes)

    def test_variant_b_act_range_scaling(self):
        a = jax.random.normal(jax.random.PRNGKey(3), (1000,))
        y = np.asarray(quantize_act(a, 4, variant="b", impl="poly"))
        assert np.abs(y).max() <= 2.0 + 1e-6


@pytest.mark.slow
class TestPolyEndToEnd:
    def test_deploy_exact_poly_model_matches_int_graph(self):
        """Poly-mode deploy-exact QAT forward vs the poly INT graph — the
        poly-mode analog of test_requant.TestDeployExactParity."""
        from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(
            bitW=8, abitW=8, method="ours", variant="int8",
            deploy_exact=True, cdf_impl="poly",
        )
        x = jax.random.normal(jax.random.PRNGKey(5), (16, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(6), x, train=False)
        logits_fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_resnet20(variables["params"], variables["batch_stats"])
        logits_i8 = np.asarray(resnet20_int8_forward(qp, x, act_impl="poly"))
        agree = (logits_fq.argmax(-1) == logits_i8.argmax(-1)).mean()
        assert agree >= 0.9

    def test_qat_poly_trains(self):
        """A few SGD steps through the poly act sites decrease the loss."""
        import optax

        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(bitW=8, abitW=8, method="ours", cdf_impl="poly")
        x = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 32, 3))
        y = jnp.arange(8) % 10
        variables = model.init(jax.random.PRNGKey(8), x, train=True)
        params, bs = variables["params"], variables["batch_stats"]
        tx = optax.sgd(0.05, momentum=0.9)
        opt = tx.init(params)

        @jax.jit
        def step(params, bs, opt):
            def loss_fn(p):
                logits, mut = model.apply(
                    {"params": p, "batch_stats": bs}, x, train=True,
                    mutable=["batch_stats"],
                )
                ce = optax.softmax_cross_entropy_with_integer_labels(logits, y)
                return ce.mean(), mut["batch_stats"]

            (l, bs2), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, u), bs2, opt2, l

        losses = []
        for _ in range(6):
            params, bs, opt, l = step(params, bs, opt)
            losses.append(float(l))
        assert losses[-1] < losses[0], losses
