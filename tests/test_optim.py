"""PDF-corrected optimizer chain vs a numpy re-derivation of the reference
update rule (utils/optimizer.py:196-262, intended semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import stats as sps

from alignq_tpu.optim import (
    alignq_sgd,
    build_correction_mask,
    correction_factor,
    multistep_schedule,
)


def np_correction(w, w_bit, lam, lam2):
    m, s = w.mean(), w.std(ddof=1)
    c = 2 * sps.norm(m, s).cdf(w) - 1
    pdf = 2 * sps.norm(m, s).pdf(w)
    t = np.mod((c + 0.5) * (2**w_bit - 1), 1.0) * lam2 * 2
    sig = 1 / (1 + np.exp(-t))
    return sig * (1 - sig) * lam * pdf


class TestCorrectionFactor:
    def test_matches_numpy(self):
        w = np.random.RandomState(0).randn(256).astype(np.float32)
        got = correction_factor(jnp.asarray(w), 8, lam=1.0, lam2=4.0)
        # f32 mod near bin boundaries amplifies rounding; 2e-5 abs is tight
        # enough to catch a formula error while tolerating float noise.
        np.testing.assert_allclose(got, np_correction(w, 8, 1.0, 4.0), atol=2e-5)

    def test_positive_and_bounded(self):
        w = np.random.RandomState(1).randn(64).astype(np.float32)
        f = np.asarray(correction_factor(jnp.asarray(w), 4, 1.0, 4.0))
        assert (f > 0).all()
        # sigma'(x) <= 1/4, pdf2 <= 2/(s*sqrt(2pi))
        assert f.max() < 2.0 / (w.std(ddof=1) * np.sqrt(2 * np.pi)) * 0.25 + 1e-5


class TestAlignQSGD:
    def test_single_step_matches_manual(self):
        rng = np.random.RandomState(2)
        w0 = rng.randn(3, 3, 4, 8).astype(np.float32)
        g = rng.randn(3, 3, 4, 8).astype(np.float32)
        lr, mom, wd, lam, lam2, w_bit = 0.04, 0.9, 1e-4, 1.0, 4.0, 8

        params = {"conv1": {"kernel": jnp.asarray(w0)}}
        grads = {"conv1": {"kernel": jnp.asarray(g)}}
        tx = alignq_sgd(
            lr, momentum=mom, weight_decay=wd, w_bit=w_bit, lam=lam, lam2=lam2,
            correction_mask={"conv1": {"kernel": True}},
        )
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = np.asarray(params["conv1"]["kernel"] + updates["conv1"]["kernel"])

        # manual reference: d = g + wd*w; buf = d (first step); corrected
        d = g + wd * w0
        corr = np_correction(w0, w_bit, lam, lam2)
        want = w0 - lr * d * corr
        np.testing.assert_allclose(new, want, atol=1e-5)

    def test_two_steps_momentum(self):
        rng = np.random.RandomState(3)
        w0 = rng.randn(16).astype(np.float32)
        g1 = rng.randn(16).astype(np.float32)
        g2 = rng.randn(16).astype(np.float32)
        lr, mom = 0.1, 0.9

        params = {"w": jnp.asarray(w0)}
        tx = alignq_sgd(lr, momentum=mom, weight_decay=0.0, w_bit=32)
        state = tx.init(params)
        u1, state = tx.update({"w": jnp.asarray(g1)}, state, params)
        params = {"w": params["w"] + u1["w"]}
        u2, state = tx.update({"w": jnp.asarray(g2)}, state, params)
        params = {"w": params["w"] + u2["w"]}

        buf = g1.copy()
        w = w0 - lr * buf
        buf = mom * buf + g2
        w = w - lr * buf
        np.testing.assert_allclose(params["w"], w, atol=1e-6)

    def test_uncorrected_leaves_get_plain_sgd(self):
        params = {"conv": jnp.ones((3, 3, 2, 2)), "head": jnp.ones((4,))}
        grads = {"conv": jnp.ones((3, 3, 2, 2)), "head": jnp.ones((4,))}
        mask = {"conv": True, "head": False}
        tx = alignq_sgd(
            1.0, momentum=0.0, weight_decay=0.0, w_bit=8, correction_mask=mask
        )
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        np.testing.assert_allclose(updates["head"], -np.ones((4,)), atol=1e-6)
        assert not np.allclose(updates["conv"], -np.ones((3, 3, 2, 2)))


class TestCorrectionMask:
    def test_conv_kernels_selected_head_excluded(self):
        params = {
            "conv0": {"kernel": jnp.zeros((3, 3, 3, 16))},
            "layers_0": {
                "conv0": {"kernel": jnp.zeros((3, 3, 16, 16))},
                "bn0": {"scale": jnp.zeros((16,))},
            },
            "logit": {"kernel": jnp.zeros((64, 10)), "bias": jnp.zeros((10,))},
        }
        mask = build_correction_mask(params, exclude=("conv0",))
        assert mask["conv0"]["kernel"] is False  # stem excluded (main.py:300)
        assert mask["layers_0"]["conv0"]["kernel"] is True
        assert mask["layers_0"]["bn0"]["scale"] is False
        assert mask["logit"]["kernel"] is False  # 2-D head kernel


class TestSchedules:
    def test_multistep(self):
        sched = multistep_schedule(0.04, [80, 120], 0.1, steps_per_epoch=10)
        assert np.isclose(sched(0), 0.04)
        assert np.isclose(sched(799), 0.04)
        assert np.isclose(sched(800), 0.004)
        assert np.isclose(sched(1200), 0.0004)


class TestCompressionInfo:
    def test_resnet20_rate(self):
        import jax

        from alignq_tpu.models import resnet20_quant
        from alignq_tpu.utils.compression import compression_info

        model = resnet20_quant(8, 8, "ours")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        info = compression_info(variables["params"], w_bit=8)
        assert info["num_conv_layers"] == 21  # stem + 18 block + 2 skip convs
        # 8-bit over all-but-first conv: rate ~ 4x (reference main.py:203)
        assert 3.9 < info["compression_rate"] < 4.2

    def test_mixed_precision_bits_fn(self):
        import jax

        from alignq_tpu.models import resnet20_quant
        from alignq_tpu.utils.compression import compression_info

        model = resnet20_quant(8, 8, "ours")
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False
        )
        info4 = compression_info(variables["params"], bits_fn=lambda p: 4)
        assert info4["compression_rate"] > 7.5


class TestProfiling:
    def test_cost_analysis_and_timing(self):
        import jax

        from alignq_tpu.utils import profiling

        def f(x):
            return jnp.dot(x, x, precision=jax.lax.Precision.HIGHEST)

        x = jnp.ones((128, 128))
        info = profiling.cost_analysis(f, x)
        assert info["flops"] >= 2 * 128**3 * 0.9
        assert info["arithmetic_intensity"] > 0
        t = profiling.measure_steady_state(jax.jit(f), x, iters=3, warmup=1)
        assert t["seconds_per_iter"] > 0


class TestMultistepSchedule:
    def test_decay_boundaries_and_warmup(self):
        from alignq_tpu.optim.schedules import multistep_schedule

        s = multistep_schedule(0.1, (2, 4), 0.1, steps_per_epoch=10,
                               warmup_epochs=1.0)
        # warmup: linear over the first 10 steps
        np.testing.assert_allclose(float(s(0)), 0.1 * (1 / 10))
        np.testing.assert_allclose(float(s(9)), 0.1)
        np.testing.assert_allclose(float(s(19)), 0.1)   # before epoch 2
        np.testing.assert_allclose(float(s(20)), 0.01)  # epoch-2 decay
        np.testing.assert_allclose(float(s(40)), 0.001)  # epoch-4 decay

    def test_huge_milestone_does_not_wrap_int32(self):
        """Regression (round 3): a sentinel milestone like 1e9 epochs used
        to overflow the int32 step comparison inside optax and silently
        pre-decay the LR from step 0 (or raise OverflowError eagerly)."""
        import jax.numpy as jnp

        from alignq_tpu.optim.schedules import multistep_schedule

        s = multistep_schedule(0.02, (10**9,), 0.1, steps_per_epoch=10**6)
        np.testing.assert_allclose(float(s(jnp.int32(0))), 0.02)
        np.testing.assert_allclose(float(s(jnp.int32(1000))), 0.02)
