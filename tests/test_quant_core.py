"""Property tests of the quantizer math against closed forms (SURVEY.md
section 4 recommendation (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats as sps

from alignq_tpu.quant import (
    cdf_transform,
    gaussian_cdf,
    gaussian_pdf2,
    quantize_act,
    quantize_weight,
    round_ste,
    tensor_stats,
    uniform_quantize,
)


class TestSTE:
    def test_grid_values(self):
        x = jnp.linspace(0.0, 1.0, 37)
        for k in (2, 4, 8):
            n = 2**k - 1
            q = uniform_quantize(x, k)
            np.testing.assert_allclose(q, np.round(np.asarray(x) * n) / n, atol=1e-6)
            # every output is on the grid
            assert np.allclose(np.asarray(q) * n, np.round(np.asarray(q) * n), atol=1e-5)

    def test_identity_32bit(self):
        x = jnp.array([0.123, -4.5])
        assert (uniform_quantize(x, 32) == x).all()

    def test_sign_1bit(self):
        x = jnp.array([-0.3, 0.0, 2.0])
        np.testing.assert_array_equal(uniform_quantize(x, 1), jnp.sign(x))

    def test_ste_gradient_is_identity(self):
        # backward of the rounding is exactly identity (quantization.py:29-36)
        g = jax.grad(lambda x: jnp.sum(uniform_quantize(x, 4) ** 2))(
            jnp.array([0.1, 0.6, 0.9])
        )
        q = uniform_quantize(jnp.array([0.1, 0.6, 0.9]), 4)
        np.testing.assert_allclose(g, 2 * q, atol=1e-6)

    def test_round_ste_grad(self):
        g = jax.grad(lambda x: jnp.sum(round_ste(x * 3.0)))(jnp.arange(5.0))
        np.testing.assert_allclose(g, 3.0 * np.ones(5), atol=1e-6)


class TestCDF:
    def test_cdf_matches_scipy(self):
        x = np.random.RandomState(0).randn(64).astype(np.float32)
        got = gaussian_cdf(jnp.asarray(x), 0.3, 1.7)
        want = sps.norm(0.3, 1.7).cdf(x)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_pdf2_matches_scipy(self):
        x = np.random.RandomState(1).randn(64).astype(np.float32)
        got = gaussian_pdf2(jnp.asarray(x), -0.2, 0.9)
        want = 2.0 * sps.norm(-0.2, 0.9).pdf(x)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_tensor_stats_bessel(self):
        # torch.std is the ddof=1 estimator
        x = np.random.RandomState(2).randn(100).astype(np.float32)
        m, s = tensor_stats(jnp.asarray(x))
        np.testing.assert_allclose(m, x.mean(), atol=1e-6)
        np.testing.assert_allclose(s, x.std(ddof=1), atol=1e-5)

    def test_variant_b_act_range_prescale(self):
        x = np.random.RandomState(3).randn(32).astype(np.float32)
        c, _ = cdf_transform(jnp.asarray(x), 0.0, 1.0, affine=True, act_range=2.0)
        want = (2.0 * sps.norm.cdf(x) - 1.0) * 2.0
        np.testing.assert_allclose(c, want, atol=1e-5)


class TestWeightQuant:
    @pytest.mark.parametrize("variant", ["a", "b"])
    @pytest.mark.parametrize("k", [2, 4, 8])
    def test_range_and_grid(self, variant, k):
        w = jnp.asarray(np.random.RandomState(4).randn(3, 3, 16, 16).astype(np.float32))
        wq = quantize_weight(w, k, variant=variant).wq
        assert float(jnp.max(jnp.abs(wq))) <= 1.0 + 1e-5
        n = 2**k - 1
        if variant == "a":
            # variant a: uniform_q(Phi)*2-1 -> grid (2r/n - 1)
            grid_pos = np.asarray((wq + 1.0) / 2.0 * n)
        else:
            # variant b: round(c*n)/n with c in [-1,1]
            grid_pos = np.asarray(wq * n)
        np.testing.assert_allclose(grid_pos, np.round(grid_pos), atol=1e-4)

    def test_32bit_identity(self):
        w = jnp.ones((4, 4))
        res = quantize_weight(w, 32)
        assert (res.wq == w).all()

    def test_gradient_flows_through_cdf_chain(self):
        # Effective gradient includes dPhi/dw — compare against the
        # transform evaluated without rounding (the STE-only path).
        w = jnp.asarray(np.random.RandomState(5).randn(64).astype(np.float32))

        def loss_q(w):
            return jnp.sum(quantize_weight(w, 8, variant="b").wq)

        def loss_c(w):
            m, s = tensor_stats(w)
            c, _ = cdf_transform(w, m, s, affine=True)
            return jnp.sum(c)

        np.testing.assert_allclose(
            jax.grad(loss_q)(w), jax.grad(loss_c)(w), atol=1e-5
        )

    def test_cdf_pdf_outputs_match_closed_form(self):
        w = np.random.RandomState(6).randn(128).astype(np.float32)
        res = quantize_weight(jnp.asarray(w), 4, variant="b")
        m, s = w.mean(), w.std(ddof=1)
        np.testing.assert_allclose(res.cdf, 2 * sps.norm(m, s).cdf(w) - 1, atol=1e-5)
        np.testing.assert_allclose(res.pdf, 2 * sps.norm(m, s).pdf(w), atol=1e-5)


class TestActQuant:
    def test_variant_a_range(self):
        a = jnp.asarray(np.random.RandomState(7).randn(256).astype(np.float32))
        aq = quantize_act(a, 8, act_range=2.0, variant="a")
        assert float(jnp.max(jnp.abs(aq))) <= 2.0 + 1e-5

    def test_variant_b_grid(self):
        a = np.random.RandomState(8).randn(256).astype(np.float32)
        aq = quantize_act(jnp.asarray(a), 4, act_range=2.0, variant="b")
        n = 2**4 - 1
        want = np.round((2 * sps.norm.cdf(a) - 1) * 2.0 * n) / n
        np.testing.assert_allclose(aq, want, atol=1e-4)

    def test_32bit_identity(self):
        a = jnp.arange(8.0)
        assert (quantize_act(a, 32) == a).all()


class TestInt8Variant:
    """The deployment-exact grid variant (train == deploy representable set)."""

    def test_weight_codes_are_int8(self):
        w = jnp.asarray(np.random.RandomState(11).randn(3, 3, 8, 8).astype(np.float32))
        wq = quantize_weight(w, 8, variant="int8").wq
        codes = np.asarray(wq) * 127.0
        np.testing.assert_allclose(codes, np.round(codes), atol=1e-4)
        assert np.abs(codes).max() <= 127.0 + 1e-4

    def test_act_codes_match_deployment(self):
        from scipy import stats as sps

        a = np.random.RandomState(12).randn(512).astype(np.float32)
        aq = np.asarray(quantize_act(jnp.asarray(a), 8, act_range=2.0, variant="int8"))
        # deployment: value = act_range * round((2*Phi-1)*127)/127
        want = 2.0 * np.round((2 * sps.norm.cdf(a) - 1) * 127) / 127
        np.testing.assert_allclose(aq, want, atol=1e-5)

    def test_int8_variant_matches_infer_codes(self):
        from alignq_tpu.kernels.infer import ACT_SCALE, _erfq_codes

        h = jnp.asarray(np.random.RandomState(13).randn(64).astype(np.float32))
        fake = np.asarray(quantize_act(h, 8, act_range=2.0, variant="int8"))
        codes = np.asarray(_erfq_codes(h)).astype(np.float32)
        np.testing.assert_allclose(fake, codes * ACT_SCALE, atol=1e-5)


class TestChannelwise:
    """Per-output-channel CDF stats (beyond the reference)."""

    def test_reconstruction_beats_per_tensor(self):
        # kernel with per-channel scale spread: channelwise fit must
        # reconstruct with lower error
        rng = np.random.RandomState(20)
        w = rng.randn(3, 3, 8, 16).astype(np.float32)
        w *= np.geomspace(0.05, 2.0, 16)[None, None, None, :]
        wj = jnp.asarray(w)
        # invert the CDF map approximately by comparing rank structure via
        # correlation of wq with w per channel
        def err(channelwise):
            wq = np.asarray(quantize_weight(wj, 4, variant="b", channelwise=channelwise).wq)
            # per-channel correlation between original and quantized codes
            cs = []
            for c in range(16):
                a, b = w[..., c].ravel(), wq[..., c].ravel()
                cs.append(np.corrcoef(a, b)[0, 1])
            return np.mean(cs)

        assert err(True) >= err(False) - 1e-6

    def test_channel_stats_shapes(self):
        from alignq_tpu.quant.cdf import channel_stats

        w = jnp.asarray(np.random.RandomState(21).randn(3, 3, 4, 8).astype(np.float32))
        m, s = channel_stats(w)
        assert m.shape == (1, 1, 1, 8) and s.shape == (1, 1, 1, 8)

    def test_correction_channelwise_matches_stats_mode(self):
        from alignq_tpu.optim.correction import correction_factor

        w = jnp.asarray(np.random.RandomState(22).randn(3, 3, 4, 8).astype(np.float32) *
                        np.geomspace(0.1, 1.0, 8)[None, None, None, :])
        f_t = np.asarray(correction_factor(w, 8, 1.0, 4.0, channelwise=False))
        f_c = np.asarray(correction_factor(w, 8, 1.0, 4.0, channelwise=True))
        assert f_t.shape == f_c.shape == w.shape
        assert not np.allclose(f_t, f_c)
        assert (f_c > 0).all()


class TestDequantDivision:
    def test_div_mode_matches_true_division_and_restores(self):
        """dequant_division (parity-harness mode, quant/ste.py): inside the
        context the grid value is IEEE round(x*n)/n (what torch computes,
        tools/reference_parity.py finding); outside, the production
        reciprocal multiply — and the two differ by at most 1 ulp on values
        where they differ at all."""
        import numpy as np

        from alignq_tpu.quant import ste

        n = 2**4 - 1
        with jax.enable_x64(True):
            x = jnp.asarray(np.linspace(-0.999, 0.999, 4097), jnp.float64)
            base = np.asarray(ste.uniform_quantize(x, 4))
            with ste.dequant_division():
                div = np.asarray(ste.uniform_quantize(x, 4))
            after = np.asarray(ste.uniform_quantize(x, 4))
        # div mode == IEEE division of the rounded code
        want = np.round(np.asarray(x, np.float64) * n) / n
        np.testing.assert_array_equal(div, want)
        # context restored: recip mode again, bitwise
        np.testing.assert_array_equal(after, base)
        # recip vs div: <= 1 ulp apart anywhere
        diff = np.abs(base - div)
        assert diff.max() <= np.spacing(np.abs(want)).max()
