"""DSAN end-task accuracy A/B: the reference's own DSAN driver vs the
framework's production DSAN steps, over N epochs (VERDICT r4 item 6).

Runs the reference dsan_office project's OWN train()/test()
(/root/reference/cdf_alignment/dsan_office/main.py:291-533, byte-for-byte
committed code — incl. its per-epoch optimizer rebuild with the DANN LR
schedule at :313-326 (feature LR/10, bottle+cls_fc at LR), the
per-iteration LMMD lambda ramp (:379-380), and the UNEVEN-LOADER
EQUALIZATION DANCE (:341-374: a shape-mismatched batch is stashed, its
loader reset, and the stash spliced into a random later batch's prefix))
for N epochs on synthetic two-domain office data, and the framework's
production DSAN step/optimizer/eval (train/da.py make_dsan_train_step +
make_da_optimizer(head_prefixes=('cls_fc','bottle')) — exactly what
fit_dsan jits) from the SAME torch initialization and source data.
Comparison is TASK-level: per-epoch target top-1 curves, pass = BEST
target top-1 gap (the reference's own tgt_best_prec1 protocol,
main.py:118-122).

The equalization dance IS exercised: the target stream carries one
half-size batch mid-epoch, which triggers the stash+reset+splice path
every epoch (random.seed pinned). Note a committed-code fact this
surfaces: with a torch DataLoader the short batch can only be the LAST of
an epoch, where `insert_iter = i + random.choice(...)` usually lands
beyond num_iterations and `tmp_info` dies with the function scope — the
splice is nearly dead code as shipped; placing the short batch mid-stream
makes both the reset AND the splice actually run. The framework side
needs no dance: ArrayLoader's drop-remainder static batches + zip-to-min
(train/da.py fit_dsan docstring) make every step full-size by
construction.

Documented schedule deltas (task-level, both sides' own semantics):
- reference ramps: per-epoch LR with the committed (epoch-1) offset and
  per-ITERATION lambda with +1e-6 (main.py:323, 379-380); framework:
  continuous per-step LR ramp, per-EPOCH lambda (fit_dsan docstring).
- reference rebuilds the optimizer every epoch (discarding momentum);
  the framework's optax chain keeps momentum across the run.
- committed mode = as-is reference (discarded-correction SGD, SURVEY.md
  2.4.7) paired with use_correction=False; --intended applies the
  one-line SGD patch on the reference side and use_correction=True here.

Environment shims (no semantics): argv-fed options import, `data` package
stub, CPU device, load_state_dict_from_url -> {} (zero egress), mkldnn
off, loader shim exposing the torch-DataLoader iterator API
(iter()/.next()/len()) over prebuilt batch lists.

Usage (CPU):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
      tools/reference_endtask_ab_dsan.py [--epochs 6] [--batch 16] \
      [--bits 8] [--n_train 256] [--intended] [--pin_threads] \
      [--robust_floor 90]

Prints per-epoch curves and one final JSON line:
  {"ref_best_tgt_top1": ..., "fit_best_tgt_top1": ..., "gap_best_pts": ...,
   "saturated": ..., "pass": ...}
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import random
import sys
import tempfile
import types

REF = "/root/reference/cdf_alignment/dsan_office"
REPO = "/root/repo"


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.003)
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_test", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--param", type=float, default=0.3,
                    help="LMMD weight (reference --param default)")
    ap.add_argument("--tol_pts", type=float, default=10.0)
    ap.add_argument("--robust_floor", type=float, default=0.0,
                    help="pass if BOTH bests >= floor (saturation = parity "
                         "on the synthetic task; see the DANN twin)")
    ap.add_argument("--pin_threads", action="store_true")
    ap.add_argument("--intended", action="store_true")
    return ap.parse_args()


HARNESS = parse_harness_args()

if HARNESS.pin_threads:
    for _v in ("OMP_NUM_THREADS", "MKL_NUM_THREADS", "OPENBLAS_NUM_THREADS"):
        os.environ[_v] = "1"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_cpu_multi_thread_eigen=false"
    ).strip()

# LR-schedule horizon: LEARNING_RATE = lr/(1+10*(epoch-1)/E)^0.75
# (main.py:313) needs E >= 11 at epoch 0. Both sides ramp over HORIZON.
HORIZON = max(HARNESS.epochs, 20)

_job = tempfile.mkdtemp(prefix="endtask_ab_dsan_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr), "--num_epochs", str(HORIZON),
    "--param", str(HARNESS.param),
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

# committed inconsistency shim: dsan_office/utils/optimizer.py:3 imports
# `utils.options`, but the project ships only options_office.py (the import
# line was copy-pasted from the classification projects) — alias it
import utils.options_office as _ref_options  # noqa: E402

sys.modules["utils.options"] = _ref_options

import main as ref_main  # noqa: E402
import model.resnet as ref_resnet  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
import utils.optimizer as ref_opt  # noqa: E402
from utils.options_office import args as ref_args  # noqa: E402

_cpu = torch.device("cpu")
ref_main.device = ref_resnet.device = ref_quant.device = _cpu
ref_resnet.load_state_dict_from_url = lambda *a, **k: {}
torch.backends.mkldnn.enabled = False
# dsan_office/utils/mmd.py:24-26 hard-codes .cuda() on the LMMD weight
# matrices (the admm twin is device-aware — SURVEY.md 2.3); identity on CPU
torch.Tensor.cuda = lambda self, *a, **k: self  # type: ignore[method-assign]


def patch_quantizer_storage():
    """Committed-state mismatch (SURVEY.md 2.4.1, same class as
    cdf_alignment/r20): dsan_office/model/quantization.py:70-78 computes
    weight_cdf/weight_pdf but never STORES them, while the committed driver
    reads `conv.quantize_fn.weight_cdf` (main.py:439-440) — the shipped
    DSAN project crashes with AttributeError at method='ours', bitW<32.
    The storing variant (cdf_alignment_admm/dann_office/model/
    quantization.py:74-85) is the intended one; this applies that minimal
    store to the LIVE module class (both committed and intended SGD modes
    need it — without it the reference side cannot run at all)."""
    orig_forward = ref_quant.weight_quantize_fn.forward

    def forward(self, x):
        if self.w_bit != 32:
            weight_cdf, weight_pdf = ref_quant.cdf(
                torch.mean(x), torch.std(x), "w")(x)
            self.weight_cdf = weight_cdf
            self.weight_pdf = weight_pdf
        return orig_forward(self, x)

    ref_quant.weight_quantize_fn.forward = forward


def load_intended_sgd():
    src = open(os.path.join(REF, "utils", "optimizer.py")).read()
    line = "p.grad.data = d_p * approx * weight_pdf"
    assert src.count(line) == 1
    mod = types.ModuleType("ref_opt_intended")
    exec(compile(src.replace(
        line, "d_p = d_p * approx * weight_pdf; p.grad.data = d_p"),
        "ref_opt_intended", "exec"), mod.__dict__)
    return mod.SGD


class RefLoader:
    """torch-DataLoader iterator surface over a prebuilt batch list (the
    committed train() calls iter(loader) then .next() — py2-style —
    main.py:335-348)."""

    class _It:
        def __init__(self, batches):
            self._it = iter(batches)

        def next(self):
            return next(self._it)

        __next__ = next

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return RefLoader._It(self.batches)


def make_dataset():
    from alignq_tpu.data.office import synthetic_domain

    def norm(u8):
        return ((u8.astype(np.float32) / 255.0) - 0.5) / 0.25

    xs, ys = synthetic_domain("amazon", HARNESS.n_train + HARNESS.n_test,
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


def to_torch(pairs):
    return [(torch.tensor(np.ascontiguousarray(a.transpose(0, 3, 1, 2))),
             torch.tensor(b)) for a, b in pairs]


def ref_target_batches(xt, yt):
    """Target stream WITH one half-size batch mid-epoch — triggers the
    equalization dance's stash+reset+splice every epoch (docstring)."""
    full = batches(xt, yt, HARNESS.batch)
    half = HARNESS.batch // 2
    short = (xt[:half], yt[:half])
    mid = len(full) // 2
    return to_torch(full[:mid] + [short] + full[mid:-1])


def blocks_of(tnet):
    out = []
    for li, layer in enumerate(
        (tnet.feature_layers.layer1, tnet.feature_layers.layer2,
         tnet.feature_layers.layer3, tnet.feature_layers.layer4), start=1
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

    feat = {"conv1": conv(tnet.feature_layers.conv1),
            "bn1": bn(tnet.feature_layers.bn1)}
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
        "feature_layers": feat,
        "bottle": dense(tnet.bottle),
        "cls_fc": dense(tnet.cls_fc),
    }


def run_reference(sgd_cls, data):
    xs, ys, xt, yt, xte, yte = data
    torch.manual_seed(0)
    random.seed(0)  # the dance's insert_iter draw (main.py:356, 364)
    model_t = ref_resnet.resnet50_dsan(
        wbit=ref_args.bitW, abit=ref_args.abitW, stage=ref_args.stage
    )
    init = copy.deepcopy(model_t)

    param_t = [p for _, p in model_t.named_parameters()]
    optimizer_t = ref_opt.SGD(param_t, lr=ref_args.lr,
                              momentum=ref_args.momentum,
                              weight_decay=ref_args.weight_decay)

    src = RefLoader(to_torch(batches(xs, ys, HARNESS.batch)))
    tgt = RefLoader(ref_target_batches(xt, yt))
    te = to_torch(batches(xte, yte, HARNESS.batch))

    prev_sgd = ref_main.SGD
    ref_main.SGD = sgd_cls  # train() rebuilds optimizer_t from this global
    curve = []
    try:
        for epoch in range(HARNESS.epochs):
            ref_main.train(ref_args, src, tgt, [model_t], [optimizer_t],
                           epoch)
            top1, _ = ref_main.test(ref_args, te, model_t, epoch, "target")
            model_t.train()
            curve.append(float(top1))
            print(json.dumps({"side": "reference", "epoch": epoch,
                              "tgt_top1": round(float(top1), 2)}), flush=True)
    finally:
        ref_main.SGD = prev_sgd
    return init, curve


def run_framework(tnet_init, use_correction, data):
    import math

    import jax
    import jax.numpy as jnp

    from alignq_tpu.models.dann import DSAN
    from alignq_tpu.train.da import (
        DAConfig, make_da_optimizer, make_dsan_train_step,
    )
    from alignq_tpu.train.state import create_train_state

    xs, ys, xt, yt, xte, yte = data
    tr_s = batches(xs, ys, HARNESS.batch)
    tr_t = batches(xt, yt, HARNESS.batch)
    te = batches(xte, yte, HARNESS.batch)
    steps_per_epoch = min(len(tr_s), len(tr_t))
    total_steps = steps_per_epoch * HORIZON

    cfg = DAConfig(
        train_batch_size=HARNESS.batch, bitW=HARNESS.bits,
        abitW=HARNESS.bits, admm=False, num_classes=31,
        param=HARNESS.param, lr=HARNESS.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, lam=ref_args.lam,
        lam2=ref_args.lam2, act_range=ref_args.act_range,
        num_epochs=HORIZON, correction_exclude=("feature_layers/conv1",),
        use_correction=use_correction, job_dir=_job + "/fit",
    )
    model = DSAN(arch="resnet50", num_classes=31, bottle_neck=True,
                 w_bit=HARNESS.bits, a_bit=HARNESS.bits, method="ours")
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg,
        input_shape=(1, HARNESS.img, HARNESS.img, 3),
        steps_per_epoch=steps_per_epoch,
    )
    tx = make_da_optimizer(
        cfg, state.params, total_steps, head_prefixes=("cls_fc", "bottle")
    )
    params = torch_params_to_jax(tnet_init, jnp)
    state = state.replace(params=params, tx=tx, opt_state=tx.init(params))
    step = jax.jit(make_dsan_train_step(model, cfg), donate_argnums=(0,))

    @jax.jit
    def ev(state, x, y):
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        return jnp.sum(jnp.argmax(pred, -1) == y)

    curve = []
    for epoch in range(HARNESS.epochs):
        # fit_dsan's per-epoch lambda over the shared HORIZON
        lambd = 2.0 / (1.0 + math.exp(-10.0 * epoch / HORIZON)) - 1.0
        for (bxs, bys), (bxt, _) in zip(tr_s, tr_t):
            state, _ = step(state, jnp.asarray(bxs), jnp.asarray(bys),
                            jnp.asarray(bxt), lambd)
        hits = tot = 0
        for bx, by in te:
            hits += int(ev(state, jnp.asarray(bx), jnp.asarray(by)))
            tot += len(by)
        curve.append(100.0 * hits / tot)
        print(json.dumps({"side": "fit", "epoch": epoch,
                          "tgt_top1": round(curve[-1], 2)}), flush=True)
    return curve


def main():
    patch_quantizer_storage()  # required in BOTH modes (docstring)
    data = make_dataset()
    sgd_cls = load_intended_sgd() if HARNESS.intended else ref_opt.SGD
    init, ref_curve = run_reference(sgd_cls, data)
    fit_curve = run_framework(init, HARNESS.intended, data)
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
