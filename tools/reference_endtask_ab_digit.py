"""Digit-DANN end-task accuracy A/B: the reference's own digit driver vs
the framework's production DANN steps, over N epochs (VERDICT r4 item 6).

Runs the reference dann_digit project's OWN train()/test()
(/root/reference/cdf_alignment/dann_digit/main.py:299-489, byte-for-byte
committed code — plain torch SGD (no PDF correction, :110), the
per-iteration LR schedule lr/(1+alpha*p)^0.75 (adjust_learning_rate,
:200-218), and the digit GRL ramp WITHOUT the office +1e-6 term (:336))
for N epochs on synthetic two-domain digit data, against the framework's
production DANN step (train/da.py make_dann_train_step — exactly what
fit_dann jits for the digit task) with the plain-SGD optimizer twin
(optim/factory.py alignq_sgd(use_correction=False) + the same
per-iteration schedule), from the SAME torch initialization and batch
order. Comparison is TASK-level: per-epoch target top-1 curves; pass =
BEST target top-1 gap (the reference's own best-prec protocol).

There is no committed/intended split here: the digit driver's optimizer
is stock torch SGD (SURVEY.md C26 digit note), so committed == intended.
tools/reference_parity_digit.py already proves 5-step BIT-level parity of
this pairing; this harness adds the task-level tier that caught real bugs
in the office families.

Determinism shim (BOTH sides, documented): Dropout2d sites run at p=0 —
cross-framework RNG streams cannot be aligned, and dropout noise is
orthogonal to the driver semantics under test (same shim as the digit
parity tool).

Environment shims (no semantics): argv-fed options import, torchvision
stub (model/dann.py imports it unused), CPU device, mkldnn off.

Usage (CPU):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      tools/reference_endtask_ab_digit.py [--epochs 6] [--batch 16] \
      [--bits 8] [--n_train 256] [--pin_threads] [--robust_floor 90]

Prints per-epoch curves and one final JSON line:
  {"ref_best_tgt_top1": ..., "fit_best_tgt_top1": ..., "gap_best_pts": ...,
   "saturated": ..., "pass": ...}
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import tempfile
import types

REF = "/root/reference/cdf_alignment/dann_digit"
REPO = "/root/repo"


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=28)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--tol_pts", type=float, default=10.0)
    ap.add_argument("--robust_floor", type=float, default=0.0,
                    help="pass if BOTH bests >= floor (saturation = parity "
                         "on the synthetic task; see the DANN twin)")
    ap.add_argument("--pin_threads", action="store_true")
    return ap.parse_args()


HARNESS = parse_harness_args()

if HARNESS.pin_threads:
    for _v in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS"):
        os.environ[_v] = "1"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_multi_thread_eigen=false"
    ).strip()

# the digit schedule ramps on p = num_iters/(E*N); run the ramp over the
# same extended horizon on both sides so the window is schedule-identical
HORIZON = max(HARNESS.epochs, 20)

_job = tempfile.mkdtemp(prefix="endtask_ab_digit_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr), "--num_epochs", str(HORIZON),
    "--momentum", "0.9", "--weight_decay", "1e-4",
    "--img_size", str(HARNESS.img), "--method", "ours",
    "--print_freq", "1000000",
]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

if HARNESS.pin_threads:
    torch.set_num_threads(1)
    torch.set_num_interop_threads(1)

# model/dann.py:6 `from torchvision import models` — never used, absent here
_tv = types.ModuleType("torchvision")
_tv.models = types.ModuleType("torchvision.models")
sys.modules.setdefault("torchvision", _tv)

import main as ref_main  # noqa: E402
import model.dann as ref_dann  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
from utils.options import args as ref_args  # noqa: E402

_cpu = torch.device("cpu")
ref_main.device = ref_dann.device = ref_quant.device = _cpu
torch.backends.mkldnn.enabled = False


def make_dataset():
    from alignq_tpu.data.office import synthetic_domain

    def norm(u8):
        return ((u8.astype(np.float32) / 255.0) - 0.5) / 0.25

    xs, ys = synthetic_domain("mnist", HARNESS.n_train + HARNESS.n_test,
                              num_classes=10, image_size=HARNESS.img, seed=0)
    xt, yt = synthetic_domain("mnistm", HARNESS.n_train + HARNESS.n_test,
                              num_classes=10, image_size=HARNESS.img, seed=0)
    n = HARNESS.n_train
    return (norm(xs[:n]), ys[:n].astype(np.int64),
            norm(xt[:n]), yt[:n].astype(np.int64),
            norm(xt[n:]), yt[n:].astype(np.int64))


def batches(x, y, bs):
    n = (len(x) // bs) * bs
    return [(x[i:i + bs], y[i:i + bs]) for i in range(0, n, bs)]


def to_torch(pairs):
    return [(torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2))),
             torch.tensor(b)) for a, b in pairs]


def build_reference_model():
    torch.manual_seed(0)
    m = ref_dann.MNISTmodel_quant(
        stage=ref_args.stage, wbit=ref_args.bitW, abit=ref_args.abitW
    )
    for mod in m.modules():  # dropout determinism shim (docstring)
        if isinstance(mod, (torch.nn.Dropout, torch.nn.Dropout2d)):
            mod.p = 0.0
    return m


def run_reference(data):
    xs, ys, xt, yt, xte, yte = data
    model_t = build_reference_model()
    init = copy.deepcopy(model_t)
    # optimizer exactly as main() builds it (main.py:110-111: plain SGD;
    # train() re-adjusts its LR per iteration via adjust_learning_rate)
    param_t = [p for _, p in model_t.named_parameters()]
    optimizer_t = torch.optim.SGD(
        param_t, lr=ref_args.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay,
    )
    src = to_torch(batches(xs, ys, HARNESS.batch))
    tgt = to_torch(batches(xt, yt, HARNESS.batch))
    te = to_torch(batches(xte, yte, HARNESS.batch))

    curve = []
    for epoch in range(HARNESS.epochs):
        ref_main.train(ref_args, src, tgt, [model_t], [optimizer_t], epoch)
        top1, _, _ = ref_main.test(ref_args, te, model_t, epoch, "target")
        model_t.train()
        curve.append(float(top1))
        print(json.dumps({"side": "reference", "epoch": epoch,
                          "tgt_top1": round(float(top1), 2)}), flush=True)
    return init, curve


# local copy of tools/reference_parity_digit.py torch_params_to_jax (that
# module parses ITS harness argv at import time, so it cannot be imported)

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
        # reference flattens NCHW (view(-1, 48*4*4)); framework NHWC
        w = m.weight.detach().numpy()
        w = w.reshape(-1, 48, 4, 4).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
        return {"kernel": jnp.asarray(w.T.copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    f = tnet.feature
    return {
        "conv1": conv(f[0]), "conv1_bn": bn(f[1]),
        "conv2": conv(f[5]), "conv2_bn": bn(f[6]),
        "classifier": {
            "fc0": dense_chw(tnet.classifier[0]), "bn0": bn(tnet.classifier[1]),
            "fc1": dense(tnet.classifier[3]), "bn1": bn(tnet.classifier[4]),
            "fc2": dense(tnet.classifier[6]),
        },
        "discriminator": {
            "fc0": dense_chw(tnet.discriminator[0]),
            "bn0": bn(tnet.discriminator[1]),
            "fc1": dense(tnet.discriminator[3]),
        },
    }


def run_framework(tnet_init, data):
    import jax
    import jax.numpy as jnp

    from alignq_tpu.models.dann import MNISTModelQuant
    from alignq_tpu.optim.factory import alignq_sgd
    from alignq_tpu.train.da import DAConfig, make_dann_train_step
    from alignq_tpu.train.state import create_train_state

    xs, ys, xt, yt, xte, yte = data
    tr_s = batches(xs, ys, HARNESS.batch)
    tr_t = batches(xt, yt, HARNESS.batch)
    te = batches(xte, yte, HARNESS.batch)
    steps_per_epoch = min(len(tr_s), len(tr_t))

    cfg = DAConfig(
        train_batch_size=HARNESS.batch, bitW=HARNESS.bits,
        abitW=HARNESS.bits, admm=False, num_classes=10,
        lr=HARNESS.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, act_range=ref_args.act_range,
        num_epochs=HORIZON, use_correction=False, correction_exclude=(),
        job_dir=_job + "/fit",
    )
    model = MNISTModelQuant(w_bit=HARNESS.bits, a_bit=HARNESS.bits,
                            method="ours", variant="a", dropout_rate=0.0)
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg,
        input_shape=(1, HARNESS.img, HARNESS.img, 3),
        steps_per_epoch=steps_per_epoch,
    )

    def schedule(step):
        # adjust_learning_rate (main.py:200-218): p = i/(E*N), i 1-based
        p = (step + 1.0) / (HORIZON * steps_per_epoch)
        return ref_args.lr / (1.0 + ref_args.alpha * p) ** 0.75

    tx = alignq_sgd(schedule, momentum=cfg.momentum,
                    weight_decay=cfg.weight_decay, w_bit=HARNESS.bits,
                    use_correction=False)
    params = torch_params_to_jax(tnet_init, jnp)
    state = state.replace(params=params, tx=tx, opt_state=tx.init(params))
    step_fn = jax.jit(make_dann_train_step(model, cfg), donate_argnums=(0,))

    @jax.jit
    def ev(state, x, y):
        cls, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, 0.0, train=False,
        )
        return jnp.sum(jnp.argmax(cls, -1) == y)

    curve = []
    it = 0
    for epoch in range(HARNESS.epochs):
        for (bxs, bys), (bxt, _) in zip(tr_s, tr_t):
            it += 1
            # digit GRL ramp (main.py:335-336): i 1-based, NO +1e-6
            p = float(it) / (HORIZON * steps_per_epoch)
            alpha = 2.0 / (1.0 + np.exp(-10.0 * p)) - 1.0
            state, _ = step_fn(state, jnp.asarray(bxs), jnp.asarray(bys),
                               jnp.asarray(bxt), float(alpha))
        hits = tot = 0
        for bx, by in te:
            hits += int(ev(state, jnp.asarray(bx), jnp.asarray(by)))
            tot += len(by)
        curve.append(100.0 * hits / tot)
        print(json.dumps({"side": "fit", "epoch": epoch,
                          "tgt_top1": round(curve[-1], 2)}), flush=True)
    return curve


def main():
    data = make_dataset()
    init, ref_curve = run_reference(data)
    fit_curve = run_framework(init, data)
    k = min(3, len(ref_curve))
    gap_final = abs(ref_curve[-1] - fit_curve[-1])
    gap_last3 = abs(sum(ref_curve[-k:]) / k - sum(fit_curve[-k:]) / k)
    gap_best = abs(max(ref_curve) - max(fit_curve))
    saturated = (
        HARNESS.robust_floor > 0
        and max(ref_curve) >= HARNESS.robust_floor
        and max(fit_curve) >= HARNESS.robust_floor
    )
    ok = bool(gap_best <= HARNESS.tol_pts or saturated)
    print(json.dumps({
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
