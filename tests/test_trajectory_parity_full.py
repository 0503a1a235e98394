"""FULL-MODEL training-dynamics parity: a real PreAct ResNet-20 with every
quant site, the ADMM correlation loss, closed-form dual updates, and the
PDF-corrected SGD — trained for 10 steps in this framework and in an
independent torch re-derivation of the canonical reference step
(/root/reference/cdf_alignment_admm/resnet-56-cifar-10/main.py:278-378),
from identical init, duals, and data. Weight trajectories must match.

This is VERDICT.md round-1 item 2: the strongest accuracy-parity evidence
available without dataset egress. The toy test (test_trajectory_parity.py)
covers one conv; this one jointly exercises all 21 quant sites of the
resnet20 'ours' topology (stem + 9 blocks x 2 + 2 stride-skip sites),
the trans-loss backward through the corr matrices, the dual assignments,
and the correction exclusion of the stem conv (main.py:300 idx[1:]).

We use the single-backward formulation (CE + sum trans): gradient-equivalent
to admm56's split backward with retain_graph (its `trans_loss += 0.5` is a
constant with zero gradient — train/steps.py docstring).

Why float64: at f32 the two implementations agree to ~1e-6 per op, but
round() flips a bin whenever a value lands within that error of a bin
boundary — measured ~1 activation flip per forward at ResNet-20 scale (a
single flip shifts an activation by a full grid step, and the trajectories
then genuinely diverge). At f64 the agreement is ~1e-15 and the flip
probability is negligible, so 10-step parity is checked at tight tolerance
through the SAME production code paths (the layers are dtype-polymorphic).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from alignq_tpu.models import resnet20_quant  # noqa: E402
from alignq_tpu.train import TrainConfig, create_train_state, make_train_step  # noqa: E402

K = 4          # bitW == abitW
ACT_RANGE = 2.0
LR, MOM, WD = 0.02, 0.9, 1e-4
LAM, LAM2 = 1.0, 4.0
MU, RHO = 0.2, 0.3
EPS = 1e-5     # corr std epsilon (dann_office quantization.py:158-161)
B = 8
STEPS = 10


# ------------- torch re-derivation of the reference math -------------

def t_wquant(w):
    """Variant-b weight fake-quant (admm quantization.py:71-85).

    Dequantizes by `* (1/n)` to bit-match the framework (quant/ste.py uses a
    reciprocal-constant multiply because XLA's compiled division is not
    IEEE-exact and differs between jit and eager — ≤1 ulp from the
    reference's literal `/n`)."""
    m, s = w.mean(), w.std()
    c = torch.distributions.Normal(m, s).cdf(w) * 2 - 1
    n = 2**K - 1
    return c + (torch.round(c * n) * (1.0 / n) - c).detach()


def t_act_cdf(a):
    """Continuous activation transform (admm quantization.py:49-58)."""
    return (torch.distributions.Normal(0.0, 1.0).cdf(a) * 2 - 1) * ACT_RANGE


def t_aquant(a):
    c = t_act_cdf(a)
    n = 2**K - 1
    return c + (torch.round(c * n) * (1.0 / n) - c).detach()


def t_corr(x):
    """Column-standardized batch correlation (quantization.py:134-137 with
    the office eps guard)."""
    mean = x.mean(dim=0)
    std = x.std(dim=0, unbiased=True)
    xs = (x - mean) / (std + EPS)
    return xs @ xs.T / xs.shape[1]


def t_correction(w):
    """sigma'(T(c)) * pdf correction (optimizer.py:234-236)."""
    m, s = w.mean(), w.std()
    normal = torch.distributions.Normal(m, s)
    c = normal.cdf(w) * 2 - 1
    pdf = torch.exp(normal.log_prob(w)) * 2
    t = ((c + 0.5) * (2**K - 1)) % 1 * LAM2 * 2
    sig = torch.sigmoid(t)
    return sig * (1 - sig) * LAM * pdf


class TorchQConv(torch.nn.Conv2d):
    def forward(self, x):
        return F.conv2d(
            x, t_wquant(self.weight), None, self.stride, self.padding
        )


class TorchActQ(torch.nn.Module):
    """Act quantizer + ADMM corr site: stores D under `site` each forward."""

    def __init__(self, site, sink):
        super().__init__()
        self.site = site
        self.sink = sink  # dict collecting {site: D}

    def forward(self, x):
        f = x.reshape(x.shape[0], -1)
        c = t_act_cdf(x).reshape(x.shape[0], -1)
        self.sink[self.site] = t_corr(c) - t_corr(f)
        return t_aquant(x)


class TorchBlock(torch.nn.Module):
    def __init__(self, in_planes, out_planes, stride, prefix, sink):
        super().__init__()
        self.stride = stride
        self.conv0 = TorchQConv(in_planes, out_planes, 3, stride, 1, bias=False)
        self.bn0 = torch.nn.BatchNorm2d(out_planes)
        self.act_q0 = TorchActQ(f"{prefix}/act_q0/d", sink)
        self.conv1 = TorchQConv(out_planes, out_planes, 3, 1, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(out_planes)
        self.act_q1 = TorchActQ(f"{prefix}/act_q1/d", sink)
        if stride != 1:
            self.skip_conv = TorchQConv(in_planes, out_planes, 1, stride, 0, bias=False)
            self.skip_bn = torch.nn.BatchNorm2d(out_planes)
            self.act_skip_q = TorchActQ(f"{prefix}/act_skip_q/d", sink)

    def forward(self, x):
        if self.stride != 1:
            sc = self.act_skip_q(self.skip_bn(self.skip_conv(x)))
        else:
            sc = x
        out = F.relu(self.act_q0(self.bn0(self.conv0(x))))
        out = self.act_q1(self.bn1(self.conv1(out)))
        return F.relu(out + sc)


class TorchResNet20(torch.nn.Module):
    def __init__(self, sink, num_classes=10):
        super().__init__()
        self.conv0 = TorchQConv(3, 16, 3, 1, 1, bias=False)
        self.bn = torch.nn.BatchNorm2d(16)
        self.act_q0 = TorchActQ("act_q0/d", sink)
        strides = [1, 1, 1, 2, 1, 1, 2, 1, 1]
        channels = [16] * 3 + [32] * 3 + [64] * 3
        blocks = []
        in_planes = 16
        for i, (s, ch) in enumerate(zip(strides, channels)):
            blocks.append(TorchBlock(in_planes, ch, s, f"layers_{i}", sink))
            in_planes = ch
        self.layers = torch.nn.ModuleList(blocks)
        self.logit = torch.nn.Linear(64, num_classes)

    def forward(self, x):
        out = F.relu(self.act_q0(self.bn(self.conv0(x))))
        for blk in self.layers:
            out = blk(out)
        out = out.mean((2, 3))
        return self.logit(out)


def t_admm_loss(d, alter_d, gamma):
    """Augmented-Lagrangian value (utils/admm.py:24-33)."""
    z, g = alter_d.detach(), gamma.detach()
    return (
        MU * z.abs().mean()
        + RHO / 2 * torch.sqrt(((d - z) ** 2).mean())
        + (g * (d - z).abs()).mean()
    )


def t_dual_update(d, alter_d, gamma):
    """Closed-form z soft-threshold + dual step (optimizer.py:104-124,
    intended semantics — SURVEY.md 2.4.4)."""
    d = d.detach()
    v = d + gamma / RHO
    vn = torch.linalg.norm(v)
    thresh = MU / RHO
    if float(vn) > thresh:
        z = (1 - thresh / vn) * v
    else:
        z = torch.zeros_like(v)
    return z, gamma + RHO * (d - z)


# ------------- param plumbing -------------

def torch_params_to_jax(tnet):
    """Map the torch net's parameters onto the flax params pytree (dtype
    follows the torch side — float64 when tnet.double()).

    NOTE the .copy(): jnp.asarray over a contiguous torch .numpy() view is
    zero-copy on CPU, so without it the 'jax params' silently track the torch
    net's in-place SGD updates (transposed kernels were immune — the
    transpose forces a copy — which made the aliasing look like a selective
    bn/bias divergence during debugging)."""
    p = {}

    def conv(m):
        return {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0).copy())}

    def bn(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy().copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    p["conv0"] = conv(tnet.conv0)
    p["bn"] = bn(tnet.bn)
    for i, blk in enumerate(tnet.layers):
        d = {
            "conv0": conv(blk.conv0), "bn0": bn(blk.bn0),
            "conv1": conv(blk.conv1), "bn1": bn(blk.bn1),
        }
        if blk.stride != 1:
            d["skip_conv"] = conv(blk.skip_conv)
            d["skip_bn"] = bn(blk.skip_bn)
        p[f"layers_{i}"] = d
    p["logit"] = {"kernel": jnp.asarray(tnet.logit.weight.detach().numpy().T.copy()),
                  "bias": jnp.asarray(tnet.logit.bias.detach().numpy().copy())}
    return p


@pytest.mark.slow
class TestFullModelTrajectoryParity:
    def test_ten_admm_steps_match(self):
        with jax.enable_x64(True):
            self._run()

    def _run(self):
        rng = np.random.RandomState(0)
        xs = [rng.randn(B, 3, 8, 8).astype(np.float64) for _ in range(STEPS)]
        ys = [rng.randint(0, 10, B).astype(np.int64) for _ in range(STEPS)]

        torch.manual_seed(0)
        sink = {}
        tnet = TorchResNet20(sink).double()
        tnet.train()

        cfg = TrainConfig(
            train_batch_size=B, bitW=K, abitW=K, admm=True, lr=LR,
            momentum=MOM, weight_decay=WD, lam=LAM, lam2=LAM2,
            admm_mu=MU, admm_rho=RHO, act_range=ACT_RANGE,
            lr_decay_steps=(1000,), correction_exclude=("conv0",),
        )
        model = resnet20_quant(bitW=K, abitW=K, method="ours", admm=True)
        state = create_train_state(
            jax.random.PRNGKey(0), model, cfg, input_shape=(1, 8, 8, 3),
            steps_per_epoch=10_000,
        )
        # one authoritative f64 init: torch params + the jax state's duals
        f64 = lambda t: jax.tree.map(  # noqa: E731
            lambda a: a.astype(jnp.float64)
            if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
        params = torch_params_to_jax(tnet)
        state = state.replace(
            params=params,
            batch_stats=f64(state.batch_stats),
            admm_duals=f64(state.admm_duals),
            opt_state=state.tx.init(params),
        )
        duals = {
            name: (torch.tensor(np.asarray(s.alter_d)),
                   torch.tensor(np.asarray(s.gamma)))
            for name, s in state.admm_duals.items()
        }
        assert len(duals) == 21  # stem + 9 blocks x 2 + 2 skip sites

        # --- torch reference trajectory ---
        bufs = {n: torch.zeros_like(p) for n, p in tnet.named_parameters()}
        for x, y in zip(xs, ys):
            sink.clear()
            tnet.zero_grad()
            logits = tnet(torch.tensor(x))
            loss = F.cross_entropy(logits, torch.tensor(y))
            trans = sum(
                t_admm_loss(sink[name], *duals[name]) for name in sorted(sink)
            )
            (loss + trans).backward()
            with torch.no_grad():
                for n, p in tnet.named_parameters():
                    g = p.grad + WD * p
                    bufs[n] = MOM * bufs[n] + g
                    g = bufs[n]
                    # corrected set: conv kernels minus the stem
                    if n.endswith("conv0.weight") and n != "conv0.weight" \
                            or "conv1.weight" in n or "skip_conv" in n:
                        g = g * t_correction(p)
                    p -= LR * g
                for name in sorted(sink):
                    duals[name] = t_dual_update(sink[name], *duals[name])

        # --- framework trajectory (the production train step) ---
        # Run UNJITTED: same production code, op-by-op execution. Under jit,
        # XLA contracts the dequant multiply + residual add into an FMA
        # (single rounding), so `act_q1 + shortcut` ties that are exactly 0
        # op-by-op (and in torch) become the multiply's +-1ulp rounding
        # residue — the relu vjp branch then flips on O(100) structural ties
        # per forward (measured: forwards bitwise-equal except the block
        # outputs' 1-ulp wobble; gradients then differ O(1)). That is branch
        # chaos at measure-zero tie points, not a math difference; eager
        # execution of the identical step proves the math at 1e-9 over 10
        # compounding steps.
        step = make_train_step(model, cfg)
        for x, y in zip(xs, ys):
            state, metrics = step(
                state, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y)
            )

        # --- compare every parameter ---
        jp = state.params
        tp = dict(tnet.named_parameters())

        def check(got, want, what):
            # atol 1e-6: torch's BLAS conv and XLA's conv accumulate in
            # different orders, so a handful of continuous values per
            # trajectory land a rounding-boundary ulp apart and nudge a few
            # weight elements to ~1e-7 by step 10 (measured 7/2304 elements
            # at 7e-8 worst) — far inside the ~1e-3 parity budget.
            got, want = np.asarray(got), want.detach().numpy()
            np.testing.assert_allclose(
                got, want, atol=1e-6, rtol=1e-5,
                err_msg=f"{what} diverged after {STEPS} steps",
            )

        check(jp["conv0"]["kernel"].transpose(3, 2, 0, 1), tp["conv0.weight"],
              "stem conv")
        check(jp["bn"]["scale"], tp["bn.weight"], "stem bn scale")
        for i in range(9):
            blk = jp[f"layers_{i}"]
            check(blk["conv0"]["kernel"].transpose(3, 2, 0, 1),
                  tp[f"layers.{i}.conv0.weight"], f"block{i} conv0")
            check(blk["conv1"]["kernel"].transpose(3, 2, 0, 1),
                  tp[f"layers.{i}.conv1.weight"], f"block{i} conv1")
            check(blk["bn0"]["scale"], tp[f"layers.{i}.bn0.weight"],
                  f"block{i} bn0 scale")
            check(blk["bn0"]["bias"], tp[f"layers.{i}.bn0.bias"],
                  f"block{i} bn0 bias")
            if f"layers.{i}.skip_conv.weight" in tp:
                check(blk["skip_conv"]["kernel"].transpose(3, 2, 0, 1),
                      tp[f"layers.{i}.skip_conv.weight"], f"block{i} skip")
        check(jp["logit"]["kernel"].T, tp["logit.weight"], "head kernel")
        check(jp["logit"]["bias"], tp["logit.bias"], "head bias")

        # --- and the dual trajectories ---
        for name, s in state.admm_duals.items():
            np.testing.assert_allclose(
                np.asarray(s.alter_d), duals[name][0].numpy(),
                atol=1e-6, rtol=1e-5, err_msg=f"alterD[{name}]",
            )
            np.testing.assert_allclose(
                np.asarray(s.gamma), duals[name][1].numpy(),
                atol=1e-6, rtol=1e-5, err_msg=f"gamma[{name}]",
            )
