"""Digit-DANN head-to-head against the ACTUAL reference code — the
VARIANT-A quantizer family's real-code verification.

tools/reference_parity.py covers the canonical variant-b/ADMM family
(cdf_alignment_admm) and tools/reference_parity_dann.py the office DA
driver; this harness covers what neither touches: the **variant-a**
quantizer formulation (raw Phi in [0,1]; wq = uniform_q(Phi)*2-1, aq =
(uniform_q(Phi)*2-1)*act_range — cdf_alignment/dann_digit/model/
quantization.py:37-101, byte-identical to the r20 family per SURVEY 2.3),
which 7 of the reference's 12 projects use, plus the digit DANN CNN (C17)
and the digit driver's plain-SGD + per-iteration LR path
(dann_digit/main.py:299-460, optimizer at :110, adjust_learning_rate at
:200-218). N real iterations of the reference's own train() at f64 vs the
framework's production make_dann_train_step from identical init/data.

PATCH INVENTORY (beyond the usual argv-controlled options import and CPU
device shims; no data stub needed — the digit main.py imports its data
modules inside main(), which we never call):
1. [determinism shim, BOTH sides, documented] Dropout2d sites run at p=0:
   cross-framework RNG streams cannot be aligned, and dropout is
   elementwise noise orthogonal to the quantizer/driver semantics under
   test. torch: every Dropout module's p set to 0 (train-mode scaling
   1/(1-p)=1, identity); framework: MNISTModelQuant(dropout_rate=0.0).
No semantic patch exists in either mode here: the digit driver uses plain
torch optim.SGD (main.py:110 — no PDF correction, SURVEY C26 digit note),
so committed == intended for the optimizer.

Framework-side matching knobs (same rationale as the sibling harnesses):
f64, eager production step, dequant_division; variant='a'; alpha fed from
the digit driver's own formula (NO +1e-6 — unlike the office ramp,
main.py:309 vs dann_office main.py:351); the per-iteration LR schedule
lr/(1+alpha*p)^0.75 with p=(i)/(E*N), i 1-based (adjust_learning_rate),
assembled through the production optimizer factory (optim.factory
alignq_sgd with use_correction=False == plain SGD(momentum, wd)).

Usage (CPU, ~1-2 min):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_parity_digit.py \
      [--steps 3] [--batch 8] [--bits 4]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

REF = "/root/reference/cdf_alignment/dann_digit"
REPO = "/root/repo"
ATOL, RTOL = 1e-6, 1e-5


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--num_epochs", type=int, default=100)
    return ap.parse_args()


HARNESS = parse_harness_args()

_job = tempfile.mkdtemp(prefix="refparity_digit_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr), "--num_epochs", str(HARNESS.num_epochs),
    "--momentum", "0.9", "--weight_decay", "1e-4",
    "--img_size", "28", "--method", "ours",
    "--print_freq", "1000000",
]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

import types  # noqa: E402

import numpy as np  # noqa: E402
import torch  # noqa: E402

# environment shim: model/dann.py:6 does `from torchvision import models`
# (the name is never used — grep: single occurrence); torchvision is absent
# from this image
_tv = types.ModuleType("torchvision")
_tv.models = types.ModuleType("torchvision.models")
sys.modules.setdefault("torchvision", _tv)

import main as ref_main  # noqa: E402
import model.dann as ref_dann  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
from utils.options import args as ref_args  # noqa: E402

_cpu = torch.device("cpu")
ref_main.device = _cpu
ref_dann.device = _cpu
ref_quant.device = _cpu


def build_reference_model():
    torch.manual_seed(0)
    m = ref_dann.MNISTmodel_quant(
        stage=ref_args.stage, wbit=ref_args.bitW, abit=ref_args.abitW
    ).double()
    for mod in m.modules():  # determinism shim 1 (docstring)
        if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
            mod.p = 0.0
    return m


def make_data(steps, batch):
    rng = np.random.RandomState(0)
    xs = [rng.randn(batch, 3, 28, 28) for _ in range(steps)]
    xt = [rng.randn(batch, 3, 28, 28) for _ in range(steps)]
    ys = [rng.randint(0, 10, batch).astype(np.int64) for _ in range(steps)]
    return xs, xt, ys


def run_reference(steps, xs, xt, ys):
    model_t = build_reference_model()
    # optimizer exactly as main() builds it (main.py:110-111: plain SGD)
    param_t = [p for n, p in model_t.named_parameters()]
    optimizer_t = torch.optim.SGD(
        param_t, lr=ref_args.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay,
    )
    loader_src = [(torch.tensor(x), torch.tensor(y)) for x, y in zip(xs, ys)]
    loader_tgt = [(torch.tensor(x), torch.tensor(np.zeros_like(ys[0])))
                  for x in xt]
    ref_main.train(ref_args, loader_src, loader_tgt, [model_t],
                   [optimizer_t], epoch=0)
    return model_t


def torch_params_to_jax(tnet, jnp):
    def conv(m):
        return {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0).copy()),
            "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    def bn(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy().copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    def dense(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().T.copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    def dense_chw(m):
        """First FC after the flatten: the reference flattens NCHW
        (view(-1, 48*4*4) — channel-major, dann.py:227), the framework
        flattens NHWC; permute the input columns (c,h,w) -> (h,w,c)."""
        w = m.weight.detach().numpy()  # (out, 48*4*4) in (c,h,w) order
        w = w.reshape(-1, 48, 4, 4).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        return {"kernel": jnp.asarray(w.T.copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    f = tnet.feature
    p = {
        "conv1": conv(f[0]), "conv1_bn": bn(f[1]),
        "conv2": conv(f[5]), "conv2_bn": bn(f[6]),
        "classifier": {
            "fc0": dense_chw(tnet.classifier[0]), "bn0": bn(tnet.classifier[1]),
            "fc1": dense(tnet.classifier[3]), "bn1": bn(tnet.classifier[4]),
            "fc2": dense(tnet.classifier[6]),
        },
        "discriminator": {
            "fc0": dense_chw(tnet.discriminator[0]), "bn0": bn(tnet.discriminator[1]),
            "fc1": dense(tnet.discriminator[3]),
        },
    }
    return p


def run_framework(tnet_init, steps, xs, xt, ys):
    import jax
    import jax.numpy as jnp
    import optax

    from alignq_tpu.models.dann import MNISTModelQuant
    from alignq_tpu.optim.factory import alignq_sgd
    from alignq_tpu.quant.ste import dequant_division
    from alignq_tpu.train.da import DAConfig, make_dann_train_step
    from alignq_tpu.train.state import create_train_state

    cfg = DAConfig(
        train_batch_size=HARNESS.batch, bitW=HARNESS.bits,
        abitW=HARNESS.bits, admm=False, num_classes=10,
        lr=ref_args.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, act_range=ref_args.act_range,
        lr_decay_steps=(1000,), use_correction=False,
    )
    model = MNISTModelQuant(w_bit=HARNESS.bits, a_bit=HARNESS.bits,
                            method="ours", variant="a", dropout_rate=0.0)
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg, input_shape=(1, 28, 28, 3),
        steps_per_epoch=1,
    )

    def schedule(step):
        # adjust_learning_rate (main.py:200-218): p = i/(E*N), i 1-based
        p = (step + 1.0) / (HARNESS.num_epochs * steps)
        return ref_args.lr / (1.0 + ref_args.alpha * p) ** 0.75

    tx = alignq_sgd(schedule, momentum=cfg.momentum,
                    weight_decay=cfg.weight_decay, w_bit=HARNESS.bits,
                    use_correction=False)
    params = torch_params_to_jax(tnet_init, jnp)
    f64 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    state = state.replace(
        params=params, batch_stats=f64(state.batch_stats),
        tx=tx, opt_state=tx.init(params),
    )
    # optax schedules count via opt_state; alignq_sgd's scale_by_learning_rate
    # tracks its own step — verify the first LR matches the reference's
    assert abs(float(schedule(0)) -
               ref_args.lr / (1 + ref_args.alpha / (HARNESS.num_epochs * steps)) ** 0.75) < 1e-15

    step_fn = make_dann_train_step(model, cfg)  # eager
    with dequant_division():
        for i, (x_s, x_t, y) in enumerate(zip(xs, xt, ys), start=1):
            # the digit GRL ramp (main.py:305-309): NO +1e-6 term
            p = float(i) / (ref_args.num_epochs * steps)
            alpha = 2.0 / (1.0 + np.exp(-10.0 * p)) - 1.0
            state, metrics = step_fn(
                state, jnp.asarray(x_s.transpose(0, 2, 3, 1)),
                jnp.asarray(y), jnp.asarray(x_t.transpose(0, 2, 3, 1)),
                float(alpha),
            )
    return state, metrics


def compare(state, tnet, steps):
    deltas = {}
    ok = True

    def rec(name, got, want):
        nonlocal ok
        got, want = np.asarray(got), want.detach().numpy()
        deltas[name] = float(np.max(np.abs(got - want)))
        ok &= bool(np.allclose(got, want, atol=ATOL, rtol=RTOL))

    jp = state.params
    f = tnet.feature
    rec("conv1.kernel", jp["conv1"]["kernel"].transpose(3, 2, 0, 1), f[0].weight)
    rec("conv1.bias", jp["conv1"]["bias"], f[0].bias)
    rec("conv1_bn.scale", jp["conv1_bn"]["scale"], f[1].weight)
    rec("conv1_bn.bias", jp["conv1_bn"]["bias"], f[1].bias)
    rec("conv2.kernel", jp["conv2"]["kernel"].transpose(3, 2, 0, 1), f[5].weight)
    rec("conv2.bias", jp["conv2"]["bias"], f[5].bias)
    rec("conv2_bn.scale", jp["conv2_bn"]["scale"], f[6].weight)
    for head, mods in (("classifier", (0, 1, 3, 4, 6)),
                       ("discriminator", (0, 1, 3))):
        seq = getattr(tnet, head)
        fcs = [i for i in mods if isinstance(seq[i], torch.nn.Linear)]
        bns = [i for i in mods if not isinstance(seq[i], torch.nn.Linear)]
        for k, i in enumerate(fcs):
            want = seq[i].weight
            if k == 0:  # undo the NCHW->NHWC flatten permutation (mapping)
                w = want.detach()
                want = w.reshape(-1, 48, 4, 4).permute(0, 2, 3, 1).reshape(w.shape[0], -1)
            rec(f"{head}.fc{k}.kernel", jp[head][f"fc{k}"]["kernel"].T, want)
            rec(f"{head}.fc{k}.bias", jp[head][f"fc{k}"]["bias"], seq[i].bias)
        for k, i in enumerate(bns):
            rec(f"{head}.bn{k}.scale", jp[head][f"bn{k}"]["scale"], seq[i].weight)
            rec(f"{head}.bn{k}.bias", jp[head][f"bn{k}"]["bias"], seq[i].bias)

    worst = max(deltas, key=deltas.get)
    out = {"steps": steps, "params_compared": len(deltas),
           "max_abs_delta": deltas[worst], "worst": worst, "pass": ok}
    print(json.dumps(out), flush=True)
    return ok


def main():
    xs, xt, ys = make_data(HARNESS.steps, HARNESS.batch)
    import jax
    with jax.enable_x64(True):
        tnet = run_reference(HARNESS.steps, xs, xt, ys)
        tnet_init = build_reference_model()
        state, _ = run_framework(tnet_init, HARNESS.steps, xs, xt, ys)
        ok = compare(state, tnet, HARNESS.steps)
    print(json.dumps({"pass": bool(ok)}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
