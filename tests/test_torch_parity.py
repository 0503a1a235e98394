"""Golden-value parity vs a minimal PyTorch re-execution of the reference
semantics (SURVEY.md section 4 recommendation (b)).

These tests re-derive the reference's canonical math in torch (from the
formulas — variant-b quantizer, STE, PDF-corrected SGD) on identical inputs
and require our JAX implementation to match values AND gradients.
Reference formulas: cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:41-85,
utils/optimizer.py:6-13,196-262.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from alignq_tpu.nn.layers import QConv
from alignq_tpu.optim import alignq_sgd
from alignq_tpu.quant import quantize_act, quantize_weight


def torch_weight_quant_b(w: "torch.Tensor", k: int):
    """Variant-b weight fake-quant with STE, in torch."""
    m, s = w.mean(), w.std()
    normal = torch.distributions.Normal(m, s)
    c = normal.cdf(w) * 2 - 1
    n = 2**k - 1
    q = torch.round(c * n) / n
    return c + (q - c).detach()  # STE: forward q, backward d(c)/dw


def torch_act_quant_b(a: "torch.Tensor", k: int, act_range: float):
    normal = torch.distributions.Normal(0.0, 1.0)
    c = (normal.cdf(a) * 2 - 1) * act_range
    n = 2**k - 1
    q = torch.round(c * n) / n
    return c + (q - c).detach()


class TestQuantizerParity:
    @pytest.mark.parametrize("k", [2, 4, 8])
    def test_weight_forward_values(self, k):
        w = np.random.RandomState(0).randn(3, 3, 8, 16).astype(np.float32)
        wt = torch.tensor(w)
        want = torch_weight_quant_b(wt, k).detach().numpy()
        got = np.asarray(quantize_weight(jnp.asarray(w), k, variant="b").wq)
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_weight_backward_through_cdf_chain(self):
        w = np.random.RandomState(1).randn(256).astype(np.float32)
        wt = torch.tensor(w, requires_grad=True)
        out = torch_weight_quant_b(wt, 4)
        (out * torch.arange(256.0)).sum().backward()
        want = wt.grad.numpy()

        def loss(w):
            return jnp.sum(
                quantize_weight(w, 4, variant="b").wq * jnp.arange(256.0)
            )

        got = np.asarray(jax.grad(loss)(jnp.asarray(w)))
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)

    @pytest.mark.parametrize("k", [4, 8])
    def test_act_forward_values(self, k):
        a = np.random.RandomState(2).randn(512).astype(np.float32)
        want = torch_act_quant_b(torch.tensor(a), k, 2.0).detach().numpy()
        got = np.asarray(quantize_act(jnp.asarray(a), k, act_range=2.0, variant="b"))
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_act_backward(self):
        a = np.random.RandomState(3).randn(128).astype(np.float32)
        at = torch.tensor(a, requires_grad=True)
        torch_act_quant_b(at, 4, 2.0).sum().backward()
        want = at.grad.numpy()
        got = np.asarray(
            jax.grad(lambda a: jnp.sum(quantize_act(a, 4, act_range=2.0)))(
                jnp.asarray(a)
            )
        )
        # d(aq)/da = act_range * 2 * phi(a) under the STE
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


class TestConvParity:
    def test_qconv_matches_torch_conv2d(self):
        """Our QConv (NHWC/HWIO) == torch F.conv2d (NCHW/OIHW) with the same
        quantized weights (reference Conv2d_Q, quantization.py:140-156)."""
        rng = np.random.RandomState(4)
        x = rng.randn(2, 3, 8, 8).astype(np.float32)  # NCHW
        w = rng.randn(16, 3, 3, 3).astype(np.float32)  # OIHW

        wq_t = torch_weight_quant_b(torch.tensor(w), 4)
        want = torch.nn.functional.conv2d(
            torch.tensor(x), wq_t, stride=1, padding=1
        ).detach().numpy()  # (2, 16, 8, 8)

        model = QConv(features=16, kernel_size=(3, 3), padding=1, use_bias=False,
                      w_bit=4, method="ours", variant="b")
        x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
        w_hwio = jnp.asarray(w.transpose(2, 3, 1, 0))
        got = model.apply({"params": {"kernel": w_hwio}}, x_nhwc)
        got_nchw = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got_nchw, want, atol=2e-4)


class TestOptimizerParity:
    def test_three_steps_vs_torch_sgd_with_correction(self):
        """torch SGD(momentum, wd) with the intended post-momentum correction
        == our alignq_sgd over multiple steps."""
        rng = np.random.RandomState(5)
        w0 = rng.randn(64).astype(np.float32)
        grads = [rng.randn(64).astype(np.float32) for _ in range(3)]
        lr, mom, wd, lam, lam2, k = 0.04, 0.9, 1e-4, 1.0, 4.0, 8

        # torch side: manual loop implementing optimizer.py:212-251 with the
        # intended update (corrected gradient applied)
        wt = torch.tensor(w0.copy())
        buf = torch.zeros_like(wt)
        for g in grads:
            d_p = torch.tensor(g) + wd * wt
            buf = mom * buf + d_p
            m, s = wt.mean(), wt.std()
            normal = torch.distributions.Normal(m, s)
            c = normal.cdf(wt) * 2 - 1
            pdf = torch.exp(normal.log_prob(wt)) * 2
            t = ((c + 0.5) * (2**k - 1)) % 1 * lam2 * 2
            sig = torch.sigmoid(t)
            approx = sig * (1 - sig) * lam
            wt = wt - lr * buf * approx * pdf

        # jax side
        params = {"w": jnp.asarray(w0)}
        tx = alignq_sgd(lr, momentum=mom, weight_decay=wd, w_bit=k,
                        lam=lam, lam2=lam2, correction_mask={"w": True})
        st = tx.init(params)
        for g in grads:
            upd, st = tx.update({"w": jnp.asarray(g)}, st, params)
            params = {"w": params["w"] + upd["w"]}

        # f32 mod near bin boundaries amplifies rounding; 2e-4 abs still
        # catches any formula/ordering error over 3 compounding steps.
        np.testing.assert_allclose(
            np.asarray(params["w"]), wt.numpy(), atol=2e-4, rtol=1e-3
        )


class TestBatchNormParity:
    def test_flax_bn_matches_torch_bn2d(self):
        from alignq_tpu.nn.layers import BatchNorm

        rng = np.random.RandomState(6)
        x = rng.randn(4, 5, 5, 3).astype(np.float32) * 2 + 1

        tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
        tbn.train()
        want = tbn(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()

        bn = BatchNorm(use_running_average=False)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got, updated = bn.apply(
            variables, jnp.asarray(x), mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5
        )
        # running stats update: torch momentum 0.1 == flax momentum 0.9
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(),
            atol=1e-5,
        )
