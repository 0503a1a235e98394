"""DA-family head-to-head against the ACTUAL reference DANN driver.

Companion to tools/reference_parity.py (classification/admm56). This one
imports the reference's flagship config — the README.md:42-48 command's
project, /root/reference/cdf_alignment_admm/dann_office/ — and runs ONE real
iteration of its own train() (main.py:292-489: GRL ramp, per-epoch optimizer
rebuild with head LR groups, corrected SGD with the office exclusion set,
ADMM_OPT dual step) on an injected synthetic loader at f64, comparing
against the framework's production DANN step (train/da.py
make_dann_train_step + make_da_optimizer) from identical init/duals/data.

Scope — ONE step, weights + losses (not multi-step duals): the committed
reference updates its ADMM duals through two quirks this framework
deliberately does not replicate (SURVEY.md 2.4.8/2.4.9, verified explicitly
below rather than matched):
  (8) `Ds = [block.admm0.D]` harvests the module attribute written by the
      LAST forward — the TARGET pass (main.py:377-380 runs src then tgt) —
      so the duals anneal toward the target-batch correlation discrepancy
      only. The framework uses the source-pass D (train/da.py, documented).
  (9) alterD/gamma are ALSO parameters of the rebuilt optimizer_t
      (feature.parameters() includes the ADMM modules, main.py:325-338), so
      gamma receives an SGD step (-lr_feat * (grad + wd*gamma)) BEFORE
      ADMM_OPT adds rho*(D_hat - z); alterD's SGD step is overwritten by the
      z-assignment. The framework's duals are state, not params: assignment
      only.
After one step the dual states therefore differ BY DESIGN; weight gradients
are identical (duals only enter the loss through values equal at step 0),
so step-1 weights must match — and do. The committed dual updates are then
verified against the quirk formulas computed from D_src/D_tgt harvested on
a deepcopy (so BN stats of the trained net stay untouched).

PATCH INVENTORY (beyond tools/reference_parity.py's environment shims —
argv-controlled options import, `data` package stub, CPU device):
1. [environment, no semantics] `load_state_dict_from_url` is stubbed to
   return {} — zero egress; the state-dict merge loop (model/resnet.py:
   276-286) then keeps the random init, i.e. pretrained=False semantics,
   which is what a from-identical-init trajectory comparison needs anyway.
2. [semantic, mode=intended ONLY, cited] the same one-line SGD patch as the
   classification harness (utils/optimizer.py:249, SURVEY.md 2.4.7 —
   dann_office's optimizer.py is byte-identical to r20's per SURVEY 2.3).

Framework-side matching knobs: f64 + eager production step +
dequant_division (same rationale as tools/reference_parity.py);
corr uses the office eps=1e-5 guard — the framework DEFAULT — because this
project's corr is the eps-guarded twin (model/quantization.py:158-161);
alpha fed from the reference's own formula (i from 1, main.py:345-349);
cfg.lr set to the reference's epoch-0 LEARNING_RATE (its (epoch-1) quirk
included, main.py:321) with the head groups at 10x via make_da_optimizer.

Usage (CPU, ~10-15 min):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_parity_dann.py \
      [--batch 4] [--img 32] [--bits 4] [--mode both]
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
ATOL, RTOL = 1e-6, 1e-5


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--img", type=int, default=32)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--num_epochs", type=int, default=200)
    ap.add_argument("--mode", choices=("committed", "intended", "both"),
                    default="both")
    return ap.parse_args()


HARNESS = parse_harness_args()

_job = tempfile.mkdtemp(prefix="refparity_dann_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr), "--num_epochs", str(HARNESS.num_epochs),
    "--print_freq", "1000000",
]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

_data = types.ModuleType("data")
_data.office = None
_data.split = None
sys.modules["data"] = _data  # main.py:19; never constructed here

import numpy as np  # noqa: E402
import torch  # noqa: E402

import main as ref_main  # noqa: E402
import model.resnet as ref_resnet  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
import utils.optimizer as ref_opt  # noqa: E402
from utils.options_office import args as ref_args  # noqa: E402

_cpu = torch.device("cpu")
ref_main.device = _cpu
ref_resnet.device = _cpu
ref_quant.device = _cpu
# patch 1 (environment): zero egress — merge loop keeps the random init
ref_resnet.load_state_dict_from_url = lambda *a, **k: {}

MU, RHO = 0.2, 0.3


def load_intended_sgd():
    """One-line intended-semantics patch (SURVEY.md 2.4.7), applied to this
    project's byte-identical utils/optimizer.py."""
    src = open(os.path.join(REF, "utils", "optimizer.py")).read()
    committed_line = "p.grad.data = d_p * approx * weight_pdf"
    patched_line = (
        "d_p = d_p * approx * weight_pdf; p.grad.data = d_p"
        "  # PATCH(SURVEY.md 2.4.7)"
    )
    assert src.count(committed_line) == 1
    mod = types.ModuleType("ref_optimizer_intended_dann")
    mod.__file__ = os.path.join(REF, "utils", "optimizer.py") + "#intended"
    exec(compile(src.replace(committed_line, patched_line),
                 mod.__file__, "exec"), mod.__dict__)
    return mod.SGD


def build_reference_model():
    torch.manual_seed(0)
    return ref_resnet.resnet50_dann(
        wbit=ref_args.bitW, abit=ref_args.abitW, stage=ref_args.stage
    ).double()


def make_data():
    rng = np.random.RandomState(0)
    xs = rng.randn(HARNESS.batch, 3, HARNESS.img, HARNESS.img)
    xt = rng.randn(HARNESS.batch, 3, HARNESS.img, HARNESS.img)
    ys = rng.randint(0, 31, HARNESS.batch).astype(np.int64)
    return xs, xt, ys


def blocks_of(tnet):
    out = []
    for li, layer in enumerate(
        (tnet.feature.layer1, tnet.feature.layer2,
         tnet.feature.layer3, tnet.feature.layer4), start=1
    ):
        for bi, blk in enumerate(layer):
            out.append((f"layer{li}_{bi}", blk))
    return out


def harvest_ds(tnet, xs, xt, alpha):
    """D_src/D_tgt per block from a DEEPCOPY (its BN mutation is discarded),
    run in the same src-then-tgt order as train() (main.py:371-380)."""
    cp = copy.deepcopy(tnet)
    cp.train()
    with torch.no_grad():
        pass  # forwards need grad-free is fine for D values
    cp(torch.tensor(xs), alpha=alpha)
    d_src = {n: b.admm0.D.detach().clone() for n, b in blocks_of(cp)}
    cp(torch.tensor(xt), alpha=alpha)
    d_tgt = {n: b.admm0.D.detach().clone() for n, b in blocks_of(cp)}
    return d_src, d_tgt


def run_reference(sgd_cls, xs, xt, ys):
    """One iteration of the reference's own train() (main.py:292-489).

    NOTE train() rebuilds optimizer_t internally from args.lr (its per-epoch
    rebuild, main.py:325-338) — the sgd_cls choice is injected by swapping
    the module global the rebuild reads."""
    model_t = build_reference_model()
    init = copy.deepcopy(model_t)
    # duals + D harvested pre-step for the quirk verification
    alpha_1 = 2.0 / (1.0 + np.exp(-10.0 * (1.0 / (HARNESS.num_epochs * 1))) + 1e-6) - 1.0
    d_src, d_tgt = harvest_ds(model_t, xs, xt, alpha_1)
    duals0 = {
        n: (b.admm0.alterD.detach().clone(), b.admm0.gamma.detach().clone())
        for n, b in blocks_of(model_t)
    }

    param_t = [p for n, p in model_t.named_parameters()]
    optimizer_t = ref_opt.SGD(param_t, lr=ref_args.lr,
                              momentum=ref_args.momentum,
                              weight_decay=ref_args.weight_decay)
    param_admm = [p for n, p in model_t.named_parameters()
                  if "alterD" in n or "gamma" in n]
    optimizer_admm = ref_opt.ADMM_OPT(param_admm)

    prev_sgd = ref_main.SGD
    ref_main.SGD = sgd_cls  # train() rebuilds optimizer_t from this global
    try:
        loader_src = [(torch.tensor(xs), torch.tensor(ys))]
        loader_tgt = [(torch.tensor(xt), torch.tensor(np.zeros_like(ys)))]
        ref_main.train(ref_args, loader_src, loader_tgt, [model_t],
                       [optimizer_t, optimizer_admm], epoch=0)
    finally:
        ref_main.SGD = prev_sgd
    return model_t, init, duals0, d_src, d_tgt


def verify_committed_dual_quirks(model_t, duals0, d_src, d_tgt):
    """Assert the trained duals match the SURVEY 2.4.8/2.4.9 quirk formulas:
    z-update on the TARGET-pass D, gamma = SGD step THEN rho*(D_tgt - z1).
    lr for the ADMM params is the feature-group LR of the rebuilt optimizer
    (LEARNING_RATE/10, main.py:325-331)."""
    lr_head = ref_args.lr / math.pow(
        1.0 + 10.0 * (0 - 1) / ref_args.num_epochs, 0.75
    )
    lr_feat = lr_head / 10.0
    wd, numel = ref_args.weight_decay, None
    max_err = 0.0
    for name, blk in blocks_of(model_t):
        z0, g0 = duals0[name]
        numel = z0.numel()
        # gamma's gradient: d(src_trans + tgt_trans)/d gamma with both trans
        # terms evaluated at (z0, g0): mean(gamma * |D - z0|) per pass
        g_grad = (torch.abs(d_src[name] - z0) + torch.abs(d_tgt[name] - z0)) / numel
        g_sgd = g0 - lr_feat * (g_grad + wd * g0)  # fresh momentum: buf = g
        v = d_tgt[name] + g_sgd / RHO
        vn = torch.linalg.norm(v)
        z1 = (1 - (MU / RHO) / vn) * v if float(vn) > MU / RHO else torch.zeros_like(v)
        g1 = g_sgd + RHO * (d_tgt[name] - z1)
        max_err = max(
            max_err,
            float((blk.admm0.alterD.detach() - z1).abs().max()),
            float((blk.admm0.gamma.detach() - g1).abs().max()),
        )
    return max_err


# ---- framework side ---------------------------------------------------------

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


def run_framework(tnet_init, use_correction, xs, xt, ys, alpha):
    import jax
    import jax.numpy as jnp

    from alignq_tpu.models.dann import DANN
    from alignq_tpu.quant.ste import dequant_division
    from alignq_tpu.train.da import (
        DAConfig, make_da_optimizer, make_dann_train_step,
    )
    from alignq_tpu.train.state import create_train_state

    lr_head = ref_args.lr / math.pow(
        1.0 + 10.0 * (0 - 1) / ref_args.num_epochs, 0.75
    )
    cfg = DAConfig(
        train_batch_size=HARNESS.batch, bitW=HARNESS.bits,
        abitW=HARNESS.bits, admm=True, num_classes=31,
        lr=lr_head, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, lam=ref_args.lam,
        lam2=ref_args.lam2, act_range=ref_args.act_range,
        admm_mu=MU, admm_rho=RHO, lr_decay_steps=(1000,),
        correction_exclude=("feature/conv1",),
        use_correction=use_correction,
    )
    model = DANN(arch="resnet50", num_classes=31, w_bit=HARNESS.bits,
                 a_bit=HARNESS.bits, method="ours", admm=True)
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg,
        input_shape=(1, HARNESS.img, HARNESS.img, 3), steps_per_epoch=1,
    )
    # the reference's epoch-0 constant LR: make_da_optimizer's schedule at
    # p ~ 0 (huge total_steps) == lr_head/10 feature, x10 heads
    tx = make_da_optimizer(
        cfg, state.params, total_steps=10**9,
        head_prefixes=("class_classifier", "domain_classifier"),
    )
    params = torch_params_to_jax(tnet_init, jnp)
    f64 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    duals = {}
    name_map = {f"feature/{n}/act_q3/d": b for n, b in blocks_of(tnet_init)}
    assert set(name_map) == set(state.admm_duals), sorted(state.admm_duals)[:4]
    for name, blk in name_map.items():
        duals[name] = state.admm_duals[name]._replace(
            alter_d=jnp.asarray(blk.admm0.alterD.detach().numpy().copy()),
            gamma=jnp.asarray(blk.admm0.gamma.detach().numpy().copy()),
        )
    state = state.replace(
        params=params, batch_stats=f64(state.batch_stats),
        admm_duals=duals, tx=tx, opt_state=tx.init(params),
    )
    step = make_dann_train_step(model, cfg)  # eager
    with dequant_division():
        state, metrics = step(
            state, jnp.asarray(xs.transpose(0, 2, 3, 1)), jnp.asarray(ys),
            jnp.asarray(xt.transpose(0, 2, 3, 1)), alpha,
        )
    return state, metrics


def compare_weights(state, tnet, mode, extra):
    deltas = {}
    ok = True

    def rec(name, got, want):
        nonlocal ok
        got, want = np.asarray(got), want.detach().numpy()
        deltas[name] = float(np.max(np.abs(got - want)))
        ok &= bool(np.allclose(got, want, atol=ATOL, rtol=RTOL))

    jp = state.params
    rec("stem.conv1", jp["feature"]["conv1"]["kernel"].transpose(3, 2, 0, 1),
        tnet.feature.conv1.weight)
    rec("stem.bn1.scale", jp["feature"]["bn1"]["scale"], tnet.feature.bn1.weight)
    for name, blk in blocks_of(tnet):
        d = jp["feature"][name]
        for cn in ("conv1", "conv2", "conv3"):
            rec(f"{name}.{cn}", d[cn]["kernel"].transpose(3, 2, 0, 1),
                getattr(blk, cn).weight)
        for bnn in ("bn1", "bn2", "bn3"):
            rec(f"{name}.{bnn}.scale", d[bnn]["scale"], getattr(blk, bnn).weight)
            rec(f"{name}.{bnn}.bias", d[bnn]["bias"], getattr(blk, bnn).bias)
        if blk.downsample is not None:
            rec(f"{name}.ds", d["downsample_conv"]["kernel"].transpose(3, 2, 0, 1),
                blk.downsample[0].weight)
            rec(f"{name}.ds_bn.scale", d["downsample_bn"]["scale"],
                blk.downsample[1].weight)
    rec("class_head.kernel", jp["class_classifier"]["kernel"].T,
        tnet.class_classifier.c_fc3.weight)
    rec("class_head.bias", jp["class_classifier"]["bias"],
        tnet.class_classifier.c_fc3.bias)
    rec("domain_head.kernel", jp["domain_classifier"]["kernel"].T,
        tnet.domain_classifier.d_fc2.weight)

    worst = max(deltas, key=deltas.get)
    rec_out = {
        "mode": mode, "params_compared": len(deltas),
        "max_abs_delta": deltas[worst], "worst": worst, "pass": ok,
    }
    rec_out.update(extra)
    print(json.dumps(rec_out), flush=True)
    return ok


def main():
    xs, xt, ys = make_data()
    modes = (("committed", ref_opt.SGD, False),
             ("intended", load_intended_sgd(), True))
    all_ok = True
    import jax
    with jax.enable_x64(True):
        for mode, sgd_cls, use_corr in modes:
            if HARNESS.mode not in ("both", mode):
                continue
            tnet, tnet_init, duals0, d_src, d_tgt = run_reference(
                sgd_cls, xs, xt, ys
            )
            quirk_err = verify_committed_dual_quirks(tnet, duals0, d_src, d_tgt)
            alpha_1 = 2.0 / (1.0 + np.exp(-10.0 / HARNESS.num_epochs) + 1e-6) - 1.0
            state, metrics = run_framework(
                tnet_init, use_corr, xs, xt, ys, float(alpha_1)
            )
            ok = compare_weights(
                state, tnet, mode,
                {"dual_quirk_formula_max_err": quirk_err,
                 "dual_quirks_verified": quirk_err < 1e-9,
                 "loss": float(metrics["loss"])},
            )
            all_ok &= ok and quirk_err < 1e-9
    print(json.dumps({"pass": bool(all_ok)}), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
