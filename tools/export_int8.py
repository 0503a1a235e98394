"""Train -> freeze -> INT8 export -> accuracy delta.

Closes the QAT-to-deployment loop: trains ResNet-20 (CDF QAT), folds the
trained params+BN stats into the INT8 inference graph
(alignq_tpu/kernels/convert.py), and reports top-1 for the fake-quant eval
path vs the true-INT8 path on the same test set — the deployment-accuracy
delta the reference never measures (it is fake-quant only).

    python tools/export_int8.py [--dataset synthetic] [--epochs 2]
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--data_dir", default="/root/data")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument(
        "--lr", type=float, default=None,
        help="override TrainConfig.lr (default 0.04). MobileNetV2 diverges "
             "from scratch at the default (ARCHITECTURE.md lr sweep) — use "
             "--lr 0.01 --warmup_epochs 1 so the agreement measurement runs "
             "on a net with real logit margins, not a chance-level one",
    )
    p.add_argument("--warmup_epochs", type=float, default=None)
    p.add_argument("--job_dir", default="/tmp/alignq_export")
    p.add_argument("--bits", type=int, default=8, help="W/A bit width (8 or 4)")
    p.add_argument(
        "--model", default="resnet20",
        choices=["resnet20", "resnet56", "mobilenetv2", "densenet40"],
    )
    p.add_argument(
        "--variant", default="int8",
        help="quantizer variant: 'int8' trains on the exact deployment grid; "
             "'b' is the reference grid (255 levels, +1 effective bit)",
    )
    p.add_argument(
        "--cdf_impl", choices=("erf", "poly"), default="erf",
        help="act-site CDF in BOTH QAT and the INT graph (poly = TPU fast "
             "grid; the pairing is what keeps train==deploy exact)",
    )
    p.add_argument(
        "--deploy_act_impl",
        choices=("same", "erf", "poly", "bins", "bins_int"),
        default="same",
        help="act-site impl in the INT graph only (default: follow "
             "--cdf_impl). 'bins' (bits<=4) evaluates the exact erf grid by "
             "boundary comparison — pairs with an erf-grid QAT run, no "
             "retraining (kernels/infer.py _erfq_codes)",
    )
    p.add_argument(
        "--stage_kernel", action="store_true",
        help="deploy through the Pallas stage megakernel (resnet20, "
             "requires --cdf_impl poly)",
    )
    p.add_argument(
        "--stage_calib", choices=("max", "ema", "ema_p999"), default="ema",
        help="StageRequant calibrator for --stage_int8 (nn/layers.py; "
             "default per the measured A/B, tools/stage_calib_ab.py)",
    )
    p.add_argument(
        "--stream", choices=("int16", "int8"), default="int16",
        help="residual-stream storage in the INT graph: 'int16' carries the "
             "exact code sum; 'int8' requantizes the full stream (shortcut "
             "included) at each block edge — half the stream HBM bytes, "
             "log2(m)<=2 bits lost per edge, trained via "
             "PreActResNet(stream_int8=True). Requires --deploy_exact "
             "(resnet20)",
    )
    p.add_argument(
        "--save", default=None, metavar="PATH.npz",
        help="save the frozen INT artifact (kernels/artifact.py) with meta "
             "recording the trained deploy options (act_impl/stream/bits) "
             "so serving picks the matching graph",
    )
    p.add_argument(
        "--pack_int4", action="store_true",
        help="with --save and --bits 4: nibble-pack the conv kernels "
             "(kernels/convert.py pack_qparams_int4) before saving — "
             "halves the artifact's kernel bytes; serving unpacks in-graph "
             "(serve.py engine_from_artifact reads the packed_int4 meta)",
    )
    p.add_argument(
        "--deploy_exact", action="store_true",
        help="deploy-exact QAT: fake-quantize the stem-input and residual "
             "requant sites during training exactly as the INT graph does "
             "(resnets: stem + per-block bounds; mobilenetv2: stem + signed "
             "m=2 block edges; densenet40: stem only)",
    )
    p.add_argument(
        "--stage_int8", action="store_true",
        help="densenet40 only: int8 STAGE BUFFER deployment — QAT trains the "
             "calibrated per-channel StageRequant sites (implies "
             "--deploy_exact) and the INT graph stores each stage's feature "
             "map as int8 codes (4x less buffer HBM traffic; VERDICT r3 "
             "item 1)",
    )
    p.add_argument(
        "--mxu_bf16", action="store_true",
        help="mixed-precision QAT: the TRAIN step runs bf16-MXU convs (2.8x "
             "the f32-HIGHEST step); eval, the agreement measurement below, "
             "and the INT export all use the f32-HIGHEST forward on the "
             "same params (train/loop.py fit docstring)",
    )
    a = p.parse_args()

    from alignq_tpu.data.registry import get_data
    from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
    from alignq_tpu.kernels.infer_densenet import (
        convert_densenet40,
        densenet40_int8_forward,
    )
    from alignq_tpu.kernels.infer_mobilenet import (
        convert_mobilenetv2,
        mobilenetv2_int8_forward,
    )
    from alignq_tpu.models import (
        densenet_40_quant,
        mobile_v2,
        resnet20_quant,
        resnet56_quant,
    )
    from alignq_tpu.train import TrainConfig, make_eval_step
    from alignq_tpu.train.loop import fit

    builders = {
        "resnet20": (resnet20_quant, convert_resnet20, resnet20_int8_forward,
                     "resnet20_quant", ("conv0",)),
        # the converter and INT graph walk PreActResNet structurally, so the
        # 56-layer net reuses them (kernels/infer.py convert_preact_resnet)
        "resnet56": (resnet56_quant, convert_resnet20, resnet20_int8_forward,
                     "resnet56_quant", ("conv0",)),
        "mobilenetv2": (mobile_v2, convert_mobilenetv2,
                        mobilenetv2_int8_forward, "mobile_v2", ()),
        # DenseNet's correction set INCLUDES the stem conv1
        # (dense-cifar-10/main.py walks all dense/trans convs)
        "densenet40": (densenet_40_quant, convert_densenet40,
                       densenet40_int8_forward, "densenet_40_quant", ()),
    }
    build, convert, int_forward, target, excl = builders[a.model]
    if a.stage_int8:
        if a.model != "densenet40":
            p.error("--stage_int8 is a densenet40 deploy option")
        a.deploy_exact = True  # the int8-buffer graph requantizes the stem input
    cfg = TrainConfig(
        target_model=target, method="ours", bitW=a.bits,
        abitW=a.bits, variant=a.variant, dataset=a.dataset,
        data_dir=a.data_dir, num_epochs=a.epochs, train_batch_size=a.batch,
        eval_batch_size=a.batch, job_dir=a.job_dir, print_freq=1000,
        correction_exclude=excl, deploy_exact=a.deploy_exact,
        cdf_impl=a.cdf_impl, mxu_bf16=a.mxu_bf16,
        stream_int8=(a.stream == "int8"), stage_int8=a.stage_int8,
        stage_calib=a.stage_calib,
        **({"lr": a.lr} if a.lr is not None else {}),
        **({"warmup_epochs": a.warmup_epochs} if a.warmup_epochs is not None else {}),
    )
    data = get_data(cfg.dataset, cfg.data_dir, cfg.train_batch_size,
                    cfg.eval_batch_size, cfg.seed)
    extra = {"deploy_exact": True} if a.deploy_exact else {}
    if a.stream == "int8":
        if not a.deploy_exact or a.model not in ("resnet20", "resnet56"):
            p.error("--stream int8 requires --deploy_exact (PreActResNet)")
        extra["stream_int8"] = True
    if a.stage_int8:
        extra["stage_int8"] = True
        extra["stage_calib"] = a.stage_calib
    # this instance is the f32-HIGHEST forward used for eval, the agreement
    # measurement, and the INT export (round 2's 6.6-pt W4A4 agreement loss
    # was the EVAL forward silently using bf16 MXU passes)
    model = build(bitW=a.bits, abitW=a.bits, method="ours", variant=a.variant,
                  cdf_impl=a.cdf_impl, **extra)
    if a.mxu_bf16:
        # registry builds the bf16-MXU train model + the f32 eval twin
        # (train/loop.py fit docstring — mixed-precision QAT)
        result = fit(cfg, data)
    else:
        result = fit(cfg, data, model=model)
    state = result["state"]
    print(f"QAT fake-quant eval top1: {result['best_top1']:.2f}")

    convert_kw = {"stage_int8": True} if a.stage_int8 else {}
    qparams = convert(
        state.params, state.batch_stats, weight_bits=a.bits, act_bits=a.bits,
        **convert_kw,
    )
    import functools

    deploy_impl = a.cdf_impl if a.deploy_act_impl == "same" else a.deploy_act_impl
    if deploy_impl in ("bins", "bins_int"):
        if a.cdf_impl != "erf" or a.bits > 4:
            p.error(
                "--deploy_act_impl bins/bins_int pairs with --cdf_impl erf,"
                " bits<=4"
            )
        if deploy_impl == "bins_int":
            if a.model not in ("resnet20", "resnet56"):
                p.error("--deploy_act_impl bins_int is wired for the "
                        "PreAct ResNets")
            if a.pack_int4:
                p.error("bins_int + --pack_int4 is not supported (serve "
                        "augments unpacked trees)")
    elif deploy_impl != a.cdf_impl:
        p.error("poly/erf deploy must match the QAT grid (--cdf_impl)")
    int_kw = {"act_bits": a.bits, "act_impl": deploy_impl}
    if a.stream == "int8":
        int_kw["stream"] = "int8"
    if a.stage_int8:
        int_kw["stage_int8"] = True
    if a.model in ("resnet20", "resnet56"):
        if a.stage_kernel:
            assert deploy_impl == "poly", "--stage_kernel requires the poly grid"
            int_kw["use_stage_kernel"] = True
    elif a.stage_kernel:
        p.error("--stage_kernel deploy is wired for resnet20")
    int8_fwd = jax.jit(functools.partial(int_forward, **int_kw))
    # bins_int runs on cutpoint-augmented qparams; the ARTIFACT stays
    # unaugmented (cutpoints derive from scale/bias — serve.py re-derives
    # them at load, keeping the on-disk schema family-uniform)
    eval_qp = qparams
    if deploy_impl == "bins_int":
        from alignq_tpu.kernels.infer import augment_int_cutpoints

        eval_qp = augment_int_cutpoints(qparams, a.bits)

    correct = total = 0
    agree = 0
    eval_step = jax.jit(make_eval_step(model, cfg))
    fq_correct = 0
    for xb, yb in data.loader_test:
        x = jnp.asarray(xb)
        y = np.asarray(yb)
        pred_i8 = np.argmax(np.asarray(int8_fwd(eval_qp, x)), -1)
        logits_fq = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        pred_fq = np.argmax(np.asarray(logits_fq), -1)
        correct += int((pred_i8 == y).sum())
        fq_correct += int((pred_fq == y).sum())
        agree += int((pred_i8 == pred_fq).sum())
        total += len(y)

    print(f"INT8 top1: {100*correct/total:.2f}  fake-quant top1: "
          f"{100*fq_correct/total:.2f}  prediction agreement: "
          f"{100*agree/total:.2f}%")
    delta = 100 * (fq_correct - correct) / total
    print(f"deployment accuracy delta (fake-quant - int8): {delta:+.2f} pts")

    if a.save:
        from alignq_tpu.kernels.artifact import save_int8_artifact

        save_qp = qparams
        if a.pack_int4:
            if a.bits != 4:
                p.error("--pack_int4 requires --bits 4 (codes must fit a nibble)")
            from alignq_tpu.kernels.convert import pack_qparams_int4

            save_qp = pack_qparams_int4(qparams)
        save_int8_artifact(a.save, save_qp, meta={
            "model": a.model, "act_bits": a.bits, "weight_bits": a.bits,
            "act_impl": deploy_impl, "stream": a.stream, "variant": a.variant,
            "deploy_exact": int(a.deploy_exact),
            "packed_int4": int(a.pack_int4),
            # structure/graph options the deploy registry must replay
            # (kernels/deploy_registry.py)
            "stage_int8": int(a.stage_int8),
            "use_stage_kernel": int(getattr(a, "stage_kernel", False)
                                    and a.model in ("resnet20", "resnet56")),
        })
        print(f"saved INT artifact -> {a.save}"
              + (" (int4-packed kernels)" if a.pack_int4 else ""))


if __name__ == "__main__":
    main()
