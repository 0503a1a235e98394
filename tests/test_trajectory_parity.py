"""End-to-end training-dynamics parity: a small quantized conv net trained
for several steps in torch (reference semantics re-derived) and in this
framework, from identical init and data — weight trajectories must match.

This is the strongest CPU-runnable accuracy-parity evidence available in a
zero-egress environment (SURVEY.md section 4b): it exercises C1-C4 (quantizer
fwd/bwd through the CDF chain), C6 (conv layers), C8 (corrected SGD after
momentum), BatchNorm semantics, and the CE loss jointly over compounding
steps.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from alignq_tpu.nn.layers import BatchNorm, QConv, QDense  # noqa: E402
from alignq_tpu.optim import alignq_sgd  # noqa: E402
from alignq_tpu.quant import quantize_act  # noqa: E402

LR, MOM, WD, LAM, LAM2, K = 0.05, 0.9, 1e-4, 1.0, 4.0, 4
ACT_RANGE = 2.0


# ---------------- torch side (reference math, re-derived) ----------------

def t_weight_quant(w):
    m, s = w.mean(), w.std()
    c = torch.distributions.Normal(m, s).cdf(w) * 2 - 1
    n = 2**K - 1
    return c + (torch.round(c * n) / n - c).detach()


def t_act_quant(a):
    c = (torch.distributions.Normal(0.0, 1.0).cdf(a) * 2 - 1) * ACT_RANGE
    n = 2**K - 1
    return c + (torch.round(c * n) / n - c).detach()


def t_correction(w):
    m, s = w.mean(), w.std()
    normal = torch.distributions.Normal(m, s)
    c = normal.cdf(w) * 2 - 1
    pdf = torch.exp(normal.log_prob(w)) * 2
    t = ((c + 0.5) * (2**K - 1)) % 1 * LAM2 * 2
    sig = torch.sigmoid(t)
    return sig * (1 - sig) * LAM * pdf


class TorchNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
        self.bn = torch.nn.BatchNorm2d(8)
        self.fc = torch.nn.Linear(8, 5)

    def forward(self, x):
        h = F.conv2d(x, t_weight_quant(self.conv.weight), padding=1)
        h = self.bn(h)
        h = t_act_quant(h)
        h = F.relu(h)
        h = h.mean((2, 3))
        return self.fc(h)


# ---------------- jax side ----------------

class JaxNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        h = QConv(features=8, kernel_size=(3, 3), padding=1, use_bias=False,
                  w_bit=K, method="ours", variant="b", name="conv")(x)
        h = BatchNorm(not train, name="bn")(h)
        h = quantize_act(h, K, act_range=ACT_RANGE, variant="b")
        h = jax.nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))
        return QDense(features=5, name="fc")(h)


class TestTrajectoryParity:
    def test_five_training_steps_match(self):
        rng = np.random.RandomState(0)
        steps = 5
        xs = [rng.randn(8, 3, 10, 10).astype(np.float32) for _ in range(steps)]
        ys = [rng.randint(0, 5, 8).astype(np.int64) for _ in range(steps)]

        # one authoritative init snapshot, shared by both runs
        jnet = JaxNet()
        x0 = jnp.asarray(xs[0].transpose(0, 2, 3, 1))
        variables = jnet.init(jax.random.PRNGKey(0), x0, train=False)
        # seed torch's GLOBAL rng: the init snapshot must not depend on how
        # much torch rng earlier tests consumed (the f32 tolerance below is
        # only safe away from STE rounding boundaries, which is init-dependent)
        torch.manual_seed(0)
        t2 = TorchNet()
        snap = {n: p.detach().clone() for n, p in t2.named_parameters()}
        params = {
            "conv": {"kernel": jnp.asarray(
                snap["conv.weight"].numpy().transpose(2, 3, 1, 0))},
            "bn": {"scale": jnp.asarray(snap["bn.weight"].numpy()),
                    "bias": jnp.asarray(snap["bn.bias"].numpy())},
            "fc": {"kernel": jnp.asarray(snap["fc.weight"].numpy().T),
                    "bias": jnp.asarray(snap["fc.bias"].numpy())},
        }
        batch_stats = variables["batch_stats"]

        # torch reference run from the same snapshot
        t2.train()
        bufs = {n: torch.zeros_like(p) for n, p in t2.named_parameters()}
        for x, y in zip(xs, ys):
            t2.zero_grad()
            loss = F.cross_entropy(t2(torch.tensor(x)), torch.tensor(y))
            loss.backward()
            with torch.no_grad():
                for n, p in t2.named_parameters():
                    d = p.grad + WD * p
                    bufs[n] = MOM * bufs[n] + d
                    g = bufs[n]
                    if n == "conv.weight":
                        g = g * t_correction(p)
                    p -= LR * g

        tx = alignq_sgd(
            LR, momentum=MOM, weight_decay=WD, w_bit=K, lam=LAM, lam2=LAM2,
            correction_mask={
                "conv": {"kernel": True},
                "bn": {"scale": False, "bias": False},
                "fc": {"kernel": False, "bias": False},
            },
        )
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state, x, y):
            def loss_fn(p):
                logits, upd = jnet.apply(
                    {"params": p, "batch_stats": batch_stats}, x, train=True,
                    mutable=["batch_stats"],
                )
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(logits, y)
                ), upd["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss

        for x, y in zip(xs, ys):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
            )

        got_conv = np.asarray(params["conv"]["kernel"]).transpose(3, 2, 0, 1)
        want_conv = t2.conv.weight.detach().numpy()
        np.testing.assert_allclose(got_conv, want_conv, atol=2e-4, rtol=1e-3)

        got_fc = np.asarray(params["fc"]["kernel"]).T
        np.testing.assert_allclose(
            got_fc, t2.fc.weight.detach().numpy(), atol=2e-4, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(params["bn"]["scale"]), t2.bn.weight.detach().numpy(),
            atol=2e-4, rtol=1e-3,
        )
