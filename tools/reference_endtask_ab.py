"""End-task accuracy A/B: the reference's own training code vs fit().

BASELINE.md's accuracy rows are blocked by zero egress (no CIFAR-10). This
is the closest achievable substitute: train the canonical admm56 config —
the reference's OWN main.py train()/test() loop, byte-for-byte committed
code — and this framework's production train/eval steps (the ones fit() jits) on
the SAME synthetic classification dataset from the SAME initialization and batch order, and
compare the learning curves and final test top-1.

Unlike the bit-level harness (tools/reference_parity.py: f64, eager,
dequant_division), this runs each side the way a USER would run it — the
reference at torch-default f32, the framework f32 JITTED with the
production reciprocal-multiply dequant — so the curves diverge numerically
(measure-zero tie flips compound) and the comparison is TASK-level: do the
two stacks learn the same task to the same accuracy at the same speed?

Modes: committed (reference as-is vs use_correction=False) by default;
--intended adds the one-line SURVEY-2.4.7 patch vs the production
correction.

Usage (CPU, ~10-20 min at defaults):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_endtask_ab.py \
      [--epochs 25] [--batch 64] [--bits 4] [--lr 0.02] [--n_train 1024]

Prints per-epoch curves and one final JSON line:
  {"ref_final_top1": ..., "fit_final_top1": ..., "gap_pts": ..., "pass": gap <= tol}
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import types

REF = "/root/reference/cdf_alignment_admm/resnet-56-cifar-10"
REPO = "/root/repo"


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--n_train", type=int, default=1024)
    ap.add_argument("--n_test", type=int, default=256)
    ap.add_argument("--tol_pts", type=float, default=8.0,
                    help="max allowed |final top-1 gap| — task-level, not "
                         "bit-level; small-sample synthetic runs swing a few "
                         "points on reruns of EITHER stack")
    ap.add_argument("--intended", action="store_true")
    return ap.parse_args()


HARNESS = parse_harness_args()

_job = tempfile.mkdtemp(prefix="endtask_ab_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr), "--num_epochs", str(HARNESS.epochs),
    "--print_freq", "1000000",
]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

_pt = types.ModuleType("ptflops")
_pt.get_model_complexity_info = lambda *a, **k: (0, 0)
sys.modules.setdefault("ptflops", _pt)
_d = types.ModuleType("data")
_d.cifar10 = None
sys.modules["data"] = _d

import numpy as np  # noqa: E402
import torch  # noqa: E402

import main as ref_main  # noqa: E402
import model.resnet as ref_resnet  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
import utils.optimizer as ref_opt  # noqa: E402
from utils.options import args as ref_args  # noqa: E402

_cpu = torch.device("cpu")
ref_main.device = ref_resnet.device = ref_quant.device = _cpu
# environment shim (no semantics): at f32 on CPU, torch's oneDNN backend
# returns channels_last conv outputs, and the reference's committed
# `x.view(x.shape[0], -1)` at the corr site (quantization.py:115) requires
# a contiguous tensor (it runs fine on CUDA and at f64). Disabling mkldnn
# restores the contiguous layout the committed code assumes.
torch.backends.mkldnn.enabled = False


def make_dataset():
    from alignq_tpu.data.datasets import synthetic

    xtr, ytr, xte, yte = synthetic(
        n_train=HARNESS.n_train, n_test=HARNESS.n_test, shape=(32, 32, 3),
        num_classes=10, seed=0,
    )

    def norm(u8):
        return (u8.astype(np.float32) / 255.0 - 0.5) / 0.25

    return norm(xtr), ytr.astype(np.int64), norm(xte), yte.astype(np.int64)


def batches(x, y, bs):
    n = (len(x) // bs) * bs
    return [(x[i:i + bs], y[i:i + bs]) for i in range(0, n, bs)]


def run_reference(xtr, ytr, xte, yte):
    torch.manual_seed(0)
    model_t = ref_resnet.resnet20_quant(
        bitW=ref_args.bitW, abitW=ref_args.abitW, stage=ref_args.stage)
    init = {k: v.detach().clone() for k, v in model_t.state_dict().items()}

    sgd_cls = ref_opt.SGD
    if HARNESS.intended:
        import os

        src = open(os.path.join(REF, "utils", "optimizer.py")).read()
        line = "p.grad.data = d_p * approx * weight_pdf"
        assert src.count(line) == 1
        mod = types.ModuleType("opt_intended")
        exec(compile(src.replace(
            line, "d_p = d_p * approx * weight_pdf; p.grad.data = d_p"),
            "opt_intended", "exec"), mod.__dict__)
        sgd_cls = mod.SGD

    param_t = [p for n, p in model_t.named_parameters()
               if "alterD" not in n and "gamma" not in n]
    opt_t = sgd_cls(param_t, lr=ref_args.lr, momentum=ref_args.momentum,
                    weight_decay=ref_args.weight_decay)
    param_admm = [p for n, p in model_t.named_parameters()
                  if "alterD" in n or "gamma" in n]
    opt_admm = ref_opt.ADMM_OPT(param_admm)

    # NCHW torch loaders, fixed order (identical to the fit() side)
    tr = [(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(y))
          for x, y in batches(xtr, ytr, HARNESS.batch)]
    te = [(torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(y))
          for x, y in batches(xte, yte, HARNESS.batch)]
    curve = []
    for epoch in range(HARNESS.epochs):
        ref_main.train(ref_args, tr, [model_t], [opt_t, opt_admm], epoch)
        top1, _ = ref_main.test(ref_args, te, model_t, epoch)
        model_t.train()
        curve.append(float(top1))
        print(json.dumps({"side": "reference", "epoch": epoch,
                          "test_top1": round(float(top1), 2)}), flush=True)
    return init, curve


def run_framework(init_sd, xtr, ytr, xte, yte):
    import jax
    import jax.numpy as jnp

    from alignq_tpu.data.loader import ArrayLoader
    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.train import TrainConfig

    cfg = TrainConfig(
        train_batch_size=HARNESS.batch, eval_batch_size=HARNESS.batch,
        bitW=HARNESS.bits, abitW=HARNESS.bits, admm=True,
        lr=HARNESS.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, lam=ref_args.lam,
        lam2=ref_args.lam2, act_range=ref_args.act_range,
        num_epochs=HARNESS.epochs, lr_decay_steps=tuple(ref_args.lr_decay_steps),
        lr_gamma=ref_args.lr_gamma, correction_exclude=("conv0",),
        use_correction=HARNESS.intended, job_dir=_job + "/fit",
        print_freq=10**6, eval_freq_epochs=1,
        # the r56 family's corr standardizes by the raw std
        # (quantization.py:134-137); match it
    )
    model = resnet20_quant(bitW=HARNESS.bits, abitW=HARNESS.bits,
                           method="ours", admm=True, corr_eps=0.0)

    # identical init: torch state dict -> flax params (mapping as in
    # tools/reference_parity.py)
    def conv(name):
        return {"kernel": jnp.asarray(
            init_sd[name].numpy().transpose(2, 3, 1, 0).copy())}

    def bnp(name):
        return {"scale": jnp.asarray(init_sd[f"{name}.weight"].numpy().copy()),
                "bias": jnp.asarray(init_sd[f"{name}.bias"].numpy().copy())}

    params = {"conv0": conv("conv0.weight"), "bn": bnp("bn")}
    i = 0
    while f"layers.{i}.conv0.weight" in init_sd:
        d = {"conv0": conv(f"layers.{i}.conv0.weight"),
             "bn0": bnp(f"layers.{i}.bn0"),
             "conv1": conv(f"layers.{i}.conv1.weight"),
             "bn1": bnp(f"layers.{i}.bn1")}
        if f"layers.{i}.skip_conv.weight" in init_sd:
            d["skip_conv"] = conv(f"layers.{i}.skip_conv.weight")
            d["skip_bn"] = bnp(f"layers.{i}.skip_bn")
        params[f"layers_{i}"] = d
        i += 1
    params["logit"] = {
        "kernel": jnp.asarray(init_sd["logit.weight"].numpy().T.copy()),
        "bias": jnp.asarray(init_sd["logit.bias"].numpy().copy())}

    tr = ArrayLoader(xtr, ytr, HARNESS.batch, shuffle=False,
                     drop_remainder=True, prefetch=0)
    te = ArrayLoader(xte, yte, HARNESS.batch, shuffle=False,
                     drop_remainder=True, prefetch=0)

    from alignq_tpu.train.state import create_train_state
    from alignq_tpu.train.steps import make_eval_step, make_train_step

    state = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               input_shape=(1, 32, 32, 3),
                               steps_per_epoch=len(tr))
    state = state.replace(params=params, opt_state=state.tx.init(params))
    step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    ev = jax.jit(make_eval_step(model, cfg))
    curve = []
    for epoch in range(HARNESS.epochs):
        for xb, yb in tr:
            state, _ = step(state, jnp.asarray(xb), jnp.asarray(yb))
        hits = tot = 0
        for xb, yb in te:
            m = ev(state, jnp.asarray(xb), jnp.asarray(yb))
            hits += float(m["top1"]) * len(yb)
            tot += len(yb)
        curve.append(100.0 * hits / tot)
        print(json.dumps({"side": "fit", "epoch": epoch,
                          "test_top1": round(curve[-1], 2)}), flush=True)
    return curve


def main():
    xtr, ytr, xte, yte = make_dataset()
    init, ref_curve = run_reference(xtr, ytr, xte, yte)
    fit_curve = run_framework(init, xtr, ytr, xte, yte)
    gap = abs(ref_curve[-1] - fit_curve[-1])
    print(json.dumps({
        "mode": "intended" if HARNESS.intended else "committed",
        "epochs": HARNESS.epochs,
        "ref_final_top1": round(ref_curve[-1], 2),
        "fit_final_top1": round(fit_curve[-1], 2),
        "ref_best_top1": round(max(ref_curve), 2),
        "fit_best_top1": round(max(fit_curve), 2),
        "gap_pts": round(gap, 2),
        "pass": bool(gap <= HARNESS.tol_pts),
    }), flush=True)
    sys.exit(0 if gap <= HARNESS.tol_pts else 1)


if __name__ == "__main__":
    main()
