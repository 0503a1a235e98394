"""Head-to-head trajectory parity against the ACTUAL reference code.

Every other parity artifact in this repo (tests/test_torch_parity.py,
tests/test_trajectory_parity_full.py) compares the framework against a torch
re-derivation AUTHORED BY THE SAME BUILDER — a misreading of reference
semantics would be replicated on both sides and never caught. This tool
closes that hole (VERDICT.md round-2 item 1): it imports the canonical admm56
project (/root/reference/cdf_alignment_admm/resnet-56-cifar-10/ — the
reference's own model/quantization/optimizer/admm modules), injects an
in-memory synthetic loader, runs N real iterations of the reference's own
`train()` function (main.py:241-403, the hot loop at :278-378) on CPU at
float64, and compares the resulting weight + ADMM-dual trajectories against
this framework's production train step (train/steps.py make_train_step, the
step `fit()` drives) from identical init, duals, and data.

Two modes, run head-to-head:

- mode=committed: the reference BYTE-FOR-BYTE as committed. Its SGD.step
  assigns the PDF correction to `p.grad.data` but updates `p.data` with the
  uncorrected momentum-buffer alias (utils/optimizer.py:249-251), and
  zero_grad discards the assignment — so the committed update is plain
  SGD(momentum, wd) for every parameter (SURVEY.md 2.4.7). Framework match:
  TrainConfig(use_correction=False).
- mode=intended: the reference with the ONE-LINE intended-semantics patch
  (the paper's correction applied to the update: `d_p = d_p * approx *
  weight_pdf` before `p.data.add_(-lr, d_p)`), justified by SURVEY.md 2.4.7.
  Framework match: use_correction=True (optim/correction.py).

PATCH INVENTORY (everything that differs from the committed reference run):
1. [environment, no semantics] module globals `device = cuda:0` in main.py:29,
   model/resnet.py:25, model/quantization.py:16 are pointed at CPU — this
   image has no CUDA.
2. [environment, no semantics] `ptflops` (imported at main.py:22, never
   called on our path) and the `data` package (main.py:20; pulls torchvision,
   absent here) are stubbed in sys.modules. We never construct its loaders —
   the synthetic loader is injected as a plain list.
3. [environment, no semantics] sys.argv is set before importing
   utils/options.py (its argparse singleton parses at import, options.py:92ff)
   so args carries the harness hyperparameters; job_dir points at a tempdir
   (utils/common.py checkpoint() makes directories at main.py import).
4. [semantic, mode=intended ONLY, cited] utils/optimizer.py:249
   `p.grad.data = d_p * approx * weight_pdf` -> `d_p = d_p * approx *
   weight_pdf; p.grad.data = d_p`, so the correction reaches the update —
   SURVEY.md 2.4.7 (the committed code discards it; README "Reference
   fidelity", PARITY.md). Applied by textual substitution, asserted present.
No other reference line is altered; notably the ADMM_OPT loop-leakage dual
update (SURVEY.md 2.4.4) runs AS COMMITTED — with dim == batch (as here and
in every reference config) the leaked `D_`/`alterD` equal the intended
z-update inputs, which is exactly what admm/state.py implements, so the runs
must (and do) agree without patching it.

Framework-side matching knobs (products of this harness, all documented):
- corr_eps=0.0 — the r56 reference standardizes by the RAW column std
  (model/quantization.py:134-137); the framework default 1e-5 is the
  office-twin guard (nn/layers.py QuantAct.corr_eps).
- float64 + unjitted production step: identical rationale and method as
  tests/test_trajectory_parity_full.py (f32 round-boundary flips and XLA FMA
  tie-breaking are measure-zero numerics, not semantics; at f64 eager the two
  stacks agree ~1e-15/op).
- dequant_division (quant/ste.py): the reference dequantizes the grid with
  true division `round(c*n)/n` (quantization.py:29-31); the framework's
  production reciprocal multiply is <=1 ulp away — and on the quantized grid
  that ulp is NOT measure-zero noise: residual sums tie at EXACT zero
  (act_q1 code == -shortcut code), and a 1-ulp dequant wobble flips the relu
  vjp mask there. Measured while building this harness: two TORCH nets with
  identical weights and logits (2e-16), differing only in `/n` vs `*(1/n)`,
  disagree O(1e-2) in conv gradients (blocks upstream of the first tie).
  This is the harness's first concrete catch: the builder-authored parity
  tests had matched the framework's reciprocal on their torch side
  (test_trajectory_parity_full.py t_wquant docstring) and could never see it.

Usage (CPU; ~2-4 min per mode at defaults):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_parity.py \
      [--steps 10] [--batch 8] [--img 8] [--bits 4] [--mode both]

Prints one JSON line per mode with max |delta| over all weights and duals,
and a final {"pass": bool} line. Thresholds: atol 1e-6 / rtol 1e-5 on every
parameter and dual (same budget as test_trajectory_parity_full.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

REF = "/root/reference/cdf_alignment_admm/resnet-56-cifar-10"
REPO = "/root/repo"

ATOL, RTOL = 1e-6, 1e-5


def parse_harness_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--img", type=int, default=8)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--mode", choices=("committed", "intended", "both"),
                    default="both")
    return ap.parse_args()


HARNESS = parse_harness_args()

# ---- reference import under controlled argv + documented stubs (patch 2,3) --
_job = tempfile.mkdtemp(prefix="refparity_")
sys.argv = [
    "main.py", "--job_dir", _job,
    "--train_batch_size", str(HARNESS.batch),
    "--eval_batch_size", str(HARNESS.batch),
    "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
    "--lr", str(HARNESS.lr),
    "--print_freq", "1000000",
]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

_ptflops = types.ModuleType("ptflops")
_ptflops.get_model_complexity_info = lambda *a, **k: (0, 0)
sys.modules.setdefault("ptflops", _ptflops)
_data = types.ModuleType("data")
_data.cifar10 = None  # main.py:20 `from data import cifar10`; never called
sys.modules["data"] = _data

import numpy as np  # noqa: E402
import torch  # noqa: E402

import main as ref_main  # noqa: E402  (the reference's own driver)
import model.resnet as ref_resnet  # noqa: E402
import model.quantization as ref_quant  # noqa: E402
import utils.optimizer as ref_opt  # noqa: E402
from utils.options import args as ref_args  # noqa: E402

# patch 1: CPU device (environment shim)
_cpu = torch.device("cpu")
ref_main.device = _cpu
ref_resnet.device = _cpu
ref_quant.device = _cpu


def load_intended_sgd():
    """Reference SGD with the one-line intended-semantics patch (patch 4,
    SURVEY.md 2.4.7). The rest of the module is byte-identical; it is
    re-executed in a fresh module namespace so the committed class stays
    untouched for mode=committed."""
    src = open(os.path.join(REF, "utils", "optimizer.py")).read()
    committed_line = "p.grad.data = d_p * approx * weight_pdf"
    patched_line = (
        "d_p = d_p * approx * weight_pdf; p.grad.data = d_p"
        "  # PATCH(SURVEY.md 2.4.7): correction reaches the update"
    )
    assert src.count(committed_line) == 1, "reference optimizer.py changed"
    mod = types.ModuleType("ref_optimizer_intended")
    mod.__file__ = os.path.join(REF, "utils", "optimizer.py") + "#intended"
    exec(compile(src.replace(committed_line, patched_line),
                 mod.__file__, "exec"), mod.__dict__)
    return mod.SGD


def make_data(steps, batch, img):
    rng = np.random.RandomState(0)
    xs = [rng.randn(batch, 3, img, img).astype(np.float64) for _ in range(steps)]
    ys = [rng.randint(0, 10, batch).astype(np.int64) for _ in range(steps)]
    return xs, ys


def build_reference_model():
    """The reference's own resnet20_quant (model/resnet.py:163-164 — the
    same PreActResNet/PreActBlock_conv_Q classes the flagship resnet56
    config uses, at the depth matching our comparison model)."""
    torch.manual_seed(0)
    return ref_resnet.resnet20_quant(
        bitW=ref_args.bitW, abitW=ref_args.abitW, stage=ref_args.stage
    ).double()


def run_reference(sgd_cls, steps, xs, ys):
    """N iterations of the reference's own train() (main.py:241-403)."""
    model_t = build_reference_model()
    # optimizer construction exactly as main() does (main.py:87-92)
    param_t = [p for n, p in model_t.named_parameters()
               if "alterD" not in n and "gamma" not in n]
    optimizer_t = sgd_cls(param_t, lr=ref_args.lr, momentum=ref_args.momentum,
                          weight_decay=ref_args.weight_decay)
    param_admm = [p for n, p in model_t.named_parameters()
                  if "alterD" in n or "gamma" in n]
    optimizer_admm = ref_opt.ADMM_OPT(param_admm)

    loader = [(torch.tensor(x), torch.tensor(y)) for x, y in zip(xs, ys)]
    ref_main.train(ref_args, loader, [model_t],
                   [optimizer_t, optimizer_admm], epoch=0)
    return model_t


# ---- framework side ---------------------------------------------------------

def torch_params_to_jax(tnet, jnp):
    """Reference state_dict -> flax params pytree (same mapping as
    tests/test_trajectory_parity_full.py; .copy() prevents zero-copy
    aliasing of the live torch tensors)."""
    def conv(m):
        return {"kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0).copy())}

    def bn(m):
        return {"scale": jnp.asarray(m.weight.detach().numpy().copy()),
                "bias": jnp.asarray(m.bias.detach().numpy().copy())}

    p = {"conv0": conv(tnet.conv0), "bn": bn(tnet.bn)}
    for i, blk in enumerate(tnet.layers):
        d = {"conv0": conv(blk.conv0), "bn0": bn(blk.bn0),
             "conv1": conv(blk.conv1), "bn1": bn(blk.bn1)}
        if blk.skip_conv is not None:
            d["skip_conv"] = conv(blk.skip_conv)
            d["skip_bn"] = bn(blk.skip_bn)
        p[f"layers_{i}"] = d
    p["logit"] = {
        "kernel": jnp.asarray(tnet.logit.weight.detach().numpy().T.copy()),
        "bias": jnp.asarray(tnet.logit.bias.detach().numpy().copy()),
    }
    return p


def dual_site_map(tnet):
    """Reference ADMM module -> framework admm_duals site name
    (model/resnet.py:48-49,63,113 vs the sowed paths of nn/layers.py)."""
    sites = {"act_q0/d": tnet.admm0}
    for i, blk in enumerate(tnet.layers):
        sites[f"layers_{i}/act_q0/d"] = blk.admm0
        sites[f"layers_{i}/act_q1/d"] = blk.admm1
        if blk.skip_conv is not None:
            sites[f"layers_{i}/act_skip_q/d"] = blk.admm_skip
    return sites


def run_framework(tnet_init, use_correction, steps, xs, ys):
    """The production train step (make_train_step — what fit() jits) from
    the torch net's init, f64, eager."""
    import jax
    import jax.numpy as jnp

    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.train import TrainConfig, create_train_state, make_train_step

    cfg = TrainConfig(
        train_batch_size=HARNESS.batch, bitW=HARNESS.bits, abitW=HARNESS.bits,
        admm=True, lr=HARNESS.lr, momentum=ref_args.momentum,
        weight_decay=ref_args.weight_decay, lam=ref_args.lam,
        lam2=ref_args.lam2, admm_mu=0.2, admm_rho=0.3,
        # decay far beyond the horizon == the reference's un-stepped
        # scheduler (constant lr); boundary must stay inside int32
        act_range=ref_args.act_range, lr_decay_steps=(1000,),
        correction_exclude=("conv0",), use_correction=use_correction,
    )
    model = resnet20_quant(bitW=HARNESS.bits, abitW=HARNESS.bits,
                           method="ours", admm=True, corr_eps=0.0)
    state = create_train_state(
        jax.random.PRNGKey(0), model, cfg,
        input_shape=(1, HARNESS.img, HARNESS.img, 3), steps_per_epoch=10_000,
    )
    f64 = lambda t: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, t)
    params = torch_params_to_jax(tnet_init, jnp)
    duals = {}
    for name, admm_mod in dual_site_map(tnet_init).items():
        duals[name] = state.admm_duals[name]._replace(
            alter_d=jnp.asarray(admm_mod.alterD.detach().numpy().copy()),
            gamma=jnp.asarray(admm_mod.gamma.detach().numpy().copy()),
        )
    state = state.replace(
        params=params, batch_stats=f64(state.batch_stats),
        admm_duals=duals, opt_state=state.tx.init(params),
    )
    from alignq_tpu.quant.ste import dequant_division

    step = make_train_step(model, cfg)  # eager on purpose (docstring)
    with dequant_division():  # bit-match the reference's `/n` grid values
        for x, y in zip(xs, ys):
            state, _ = step(state, jnp.asarray(x.transpose(0, 2, 3, 1)),
                            jnp.asarray(y))
    return state


def compare(state, tnet, mode):
    """Max |delta| + allclose over every parameter and dual."""
    deltas = {}
    ok = True

    def rec(name, got, want):
        nonlocal ok
        got = np.asarray(got)
        want = want.detach().numpy()
        deltas[name] = float(np.max(np.abs(got - want)))
        ok &= bool(np.allclose(got, want, atol=ATOL, rtol=RTOL))

    jp, tp = state.params, dict(tnet.named_parameters())
    rec("conv0", jp["conv0"]["kernel"].transpose(3, 2, 0, 1), tp["conv0.weight"])
    rec("bn.scale", jp["bn"]["scale"], tp["bn.weight"])
    rec("bn.bias", jp["bn"]["bias"], tp["bn.bias"])
    for i in range(len(tnet.layers)):
        blk = jp[f"layers_{i}"]
        rec(f"L{i}.conv0", blk["conv0"]["kernel"].transpose(3, 2, 0, 1),
            tp[f"layers.{i}.conv0.weight"])
        rec(f"L{i}.conv1", blk["conv1"]["kernel"].transpose(3, 2, 0, 1),
            tp[f"layers.{i}.conv1.weight"])
        for bnn in ("bn0", "bn1"):
            rec(f"L{i}.{bnn}.scale", blk[bnn]["scale"], tp[f"layers.{i}.{bnn}.weight"])
            rec(f"L{i}.{bnn}.bias", blk[bnn]["bias"], tp[f"layers.{i}.{bnn}.bias"])
        if f"layers.{i}.skip_conv.weight" in tp:
            rec(f"L{i}.skip", blk["skip_conv"]["kernel"].transpose(3, 2, 0, 1),
                tp[f"layers.{i}.skip_conv.weight"])
    rec("logit.kernel", jp["logit"]["kernel"].T, tp["logit.weight"])
    rec("logit.bias", jp["logit"]["bias"], tp["logit.bias"])

    n_duals = 0
    for name, admm_mod in dual_site_map(tnet).items():
        rec(f"alterD[{name}]", state.admm_duals[name].alter_d, admm_mod.alterD)
        rec(f"gamma[{name}]", state.admm_duals[name].gamma, admm_mod.gamma)
        n_duals += 1

    worst = max(deltas, key=deltas.get)
    print(json.dumps({
        "mode": mode,
        "steps": HARNESS.steps,
        "params_compared": len(deltas) - 2 * n_duals,
        "dual_sites": n_duals,
        "max_abs_delta": deltas[worst],
        "worst": worst,
        "pass": ok,
    }), flush=True)
    return ok


def main():
    xs, ys = make_data(HARNESS.steps, HARNESS.batch, HARNESS.img)
    modes = (("committed", ref_opt.SGD, False),
             ("intended", load_intended_sgd(), True))
    all_ok = True
    import jax
    with jax.enable_x64(True):
        for mode, sgd_cls, use_corr in modes:
            if HARNESS.mode not in ("both", mode):
                continue
            tnet = run_reference(sgd_cls, HARNESS.steps, xs, ys)
            # identical fresh init on the framework side (same torch seed)
            tnet_init = build_reference_model()
            state = run_framework(tnet_init, use_corr, HARNESS.steps, xs, ys)
            all_ok &= compare(state, tnet, mode)
    print(json.dumps({"pass": bool(all_ok)}), flush=True)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
