"""ADMM core: correlation matrices, augmented-Lagrangian loss, dual updates."""

import jax
import jax.numpy as jnp
import numpy as np

from alignq_tpu.admm import (
    ADMMConfig,
    ADMMSiteState,
    admm_loss,
    corr,
    corr_discrepancy,
    dual_update,
    init_site,
)


def np_corr(x):
    xs = (x - x.mean(0)) / x.std(0, ddof=1)
    return xs @ xs.T / x.shape[1]


class TestCorr:
    def test_matches_numpy(self):
        x = np.random.RandomState(0).randn(16, 64).astype(np.float32)
        np.testing.assert_allclose(corr(jnp.asarray(x), jnp.asarray(x)), np_corr(x), atol=1e-4)

    def test_trace_identity(self):
        # With per-column ddof=1 standardization, sum_i z[i,f]^2 == B-1 for
        # every feature f, so trace(corr) == B-1 exactly.
        b = 8
        x = np.random.RandomState(1).randn(b, 256).astype(np.float32)
        c = np.asarray(corr(jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(np.trace(c), b - 1, rtol=1e-4)

    def test_discrepancy_zero_for_identity_transform(self):
        x = jnp.asarray(np.random.RandomState(2).randn(8, 32).astype(np.float32))
        d = corr_discrepancy(x, x)
        np.testing.assert_allclose(d, np.zeros((8, 8)), atol=1e-5)

    def test_eps_guard(self):
        x = np.ones((4, 8), dtype=np.float32)  # zero std columns
        c = corr(jnp.asarray(x), jnp.asarray(x), eps=1e-5)
        assert np.isfinite(np.asarray(c)).all()

    def test_constant_column_gradient_finite(self):
        """Regression: a feature column constant across the batch (exact ties
        from quantized activations, common with small per-shard B_local) must
        not produce NaN gradients — jnp.std's sqrt-backward at var=0 did
        (found via NaN abort on the corr_mode=local CLI path)."""
        x = np.random.RandomState(0).randn(4, 8).astype(np.float32)
        x[:, 3] = 0.7  # exactly constant column

        def loss(x):
            return jnp.sum(corr(x, x, eps=1e-5) ** 2)

        g = jax.grad(loss)(jnp.asarray(x))
        assert np.isfinite(np.asarray(g)).all()


class TestLoss:
    def test_value_matches_closed_form(self):
        rng = np.random.RandomState(3)
        d = rng.randn(6, 6).astype(np.float32)
        z = rng.rand(6, 6).astype(np.float32)
        g = rng.rand(6, 6).astype(np.float32)
        cfg = ADMMConfig()
        got = admm_loss(jnp.asarray(d), jnp.asarray(z), jnp.asarray(g), cfg)
        want = (
            cfg.mu * np.abs(z).mean()
            + cfg.rho / 2 * np.sqrt(((d - z) ** 2).mean())
            + (g * np.abs(d - z)).mean()
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_grad_flows_to_d_only(self):
        d = jnp.ones((4, 4))
        z = jnp.ones((4, 4)) * 0.5
        g = jnp.ones((4, 4)) * 0.1
        grad_d = jax.grad(lambda d: admm_loss(d, z, g))(d)
        assert np.isfinite(np.asarray(grad_d)).all()
        assert float(jnp.sum(jnp.abs(grad_d))) > 0
        # duals are stop-gradiented inside the loss
        grad_z = jax.grad(lambda z: admm_loss(d, z, g))(z)
        np.testing.assert_allclose(grad_z, np.zeros((4, 4)))


class TestDualUpdate:
    def test_soft_threshold_shrink_branch(self):
        cfg = ADMMConfig(mu=0.2, rho=0.3)
        d = jnp.ones((3, 3)) * 2.0
        st = ADMMSiteState(alter_d=jnp.zeros((3, 3)), gamma=jnp.zeros((3, 3)))
        new = dual_update(st, d, cfg)
        v = np.asarray(d)  # gamma = 0 -> V = D
        vn = np.linalg.norm(v)
        want_z = (1 - (cfg.mu / cfg.rho) / vn) * v
        np.testing.assert_allclose(new.alter_d, want_z, rtol=1e-5)
        np.testing.assert_allclose(new.gamma, cfg.rho * (v - want_z), rtol=1e-5)

    def test_soft_threshold_zero_branch(self):
        cfg = ADMMConfig(mu=0.2, rho=0.3)
        d = jnp.ones((3, 3)) * 1e-4  # ||V|| << mu/rho
        st = ADMMSiteState(alter_d=jnp.ones((3, 3)), gamma=jnp.zeros((3, 3)))
        new = dual_update(st, d, cfg)
        np.testing.assert_allclose(new.alter_d, np.zeros((3, 3)))

    def test_init_shapes_and_range(self):
        st = init_site(jax.random.PRNGKey(0), 16)
        assert st.alter_d.shape == (16, 16) and st.gamma.shape == (16, 16)
        assert float(st.alter_d.min()) >= 0.0 and float(st.alter_d.max()) < 1.0

    def test_fixed_point_when_d_constant(self):
        # Iterating the closed-form updates on a constant D converges:
        # gamma grows until z absorbs D (L2 soft-threshold fixed point).
        cfg = ADMMConfig()
        d = jnp.asarray(np.random.RandomState(4).randn(8, 8).astype(np.float32))
        st = init_site(jax.random.PRNGKey(1), 8)
        for _ in range(200):
            st = dual_update(st, d, cfg)
        gap = float(jnp.sqrt(jnp.mean((d - st.alter_d) ** 2)))
        assert gap < 0.05
