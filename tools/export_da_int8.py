"""Train -> freeze -> INT8 export -> agreement, for the DA families.

The classification loop has tools/export_int8.py; this is its domain-
adaptation twin. It trains a small DA model (digit DANN / office DANN /
office DSAN — synthetic fallback when no dataset is on disk), folds the
trained trunk into the matching INT graph
(kernels/infer_digit.py / kernels/infer_resnet_imagenet.py), and reports
target-set class top-1 for the fake-quant eval path vs the true-INT path —
the trained-model validation CLAUDE.md requires (random-init argmax
agreement hides ordering bugs; the kernel tests only cover random init).

    python tools/export_da_int8.py --task digit --epochs 2
    python tools/export_da_int8.py --task dsan --arch resnet18 --image_size 64
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
    p.add_argument("--task", choices=["digit", "dann", "dsan", "mdd"],
                   default="digit")
    p.add_argument("--arch", default="resnet18")
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--image_size", type=int, default=64, help="office tasks")
    p.add_argument("--img_size", type=int, default=28, help="digit task")
    p.add_argument("--src_data", default=None)
    p.add_argument("--tgt_data", default=None)
    p.add_argument("--data_dir", default="/root/data")
    p.add_argument("--job_dir", default="/tmp/alignq_export_da")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="override DAConfig.lr (default 1e-3)")
    p.add_argument("--save", default=None,
                   help="save the frozen INT artifact (kernels/artifact.py) "
                        "with family meta so serve.py engine_from_artifact "
                        "can rebuild the matching deploy graph "
                        "(kernels/deploy_registry.py)")
    a = p.parse_args()

    from alignq_tpu.train.da import DAConfig, fit_dann, fit_dsan, fit_mdd

    bits = a.bits
    if a.task == "digit":
        from alignq_tpu.data.digits import get_digit_domain
        from alignq_tpu.kernels.infer_digit import (
            convert_mnist_dann,
            mnist_dann_int8_forward,
        )
        from alignq_tpu.models import mnist_model_quant

        src = a.src_data or "mnist"
        tgt = a.tgt_data or "mnistm"
        loaders = {
            key: get_digit_domain(dom, a.data_dir, a.batch, train=train,
                                  img_size=a.img_size)
            for key, dom, train in (
                ("src_train", src, True), ("tgt_train", tgt, True),
                ("src_test", src, False), ("tgt_test", tgt, False),
            )
        }
        model = mnist_model_quant(bitW=bits, abitW=bits, method="ours",
                                  variant="int8")
        cfg = DAConfig(
            train_batch_size=a.batch, eval_batch_size=a.batch, bitW=bits,
            abitW=bits, num_classes=10, num_epochs=a.epochs,
            job_dir=a.job_dir, use_correction=False, correction_exclude=(),
            **({"lr": a.lr} if a.lr is not None else {}),
        )
        result = fit_dann(cfg, loaders, model, max_steps=a.max_steps)
        state = result["state"]
        qp = convert_mnist_dann(state.params, state.batch_stats,
                                weight_bits=bits, act_bits=bits)
        int_fwd = jax.jit(
            lambda q, x: mnist_dann_int8_forward(q, x, act_bits=bits)[0]
        )
        fq_fwd = jax.jit(
            lambda v, x: model.apply(v, x, 0.0, train=False)[0]
        )
    else:
        from alignq_tpu.data.office import get_office_pair
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_dann,
            convert_dsan,
            convert_mdd,
            dann_int8_forward,
            dsan_int8_forward,
            mdd_int8_forward,
        )

        src = a.src_data or "dslr"
        tgt = a.tgt_data or "webcam"
        loaders = get_office_pair(
            a.data_dir, src, tgt, a.batch, a.batch,
            image_size=a.image_size,
        )
        cfg = DAConfig(
            train_batch_size=a.batch, eval_batch_size=a.batch, bitW=bits,
            abitW=bits, num_classes=31, num_epochs=a.epochs,
            job_dir=a.job_dir, correction_exclude=(),
            **({"lr": a.lr} if a.lr is not None else {}),
        )
        if a.task == "dann":
            from alignq_tpu.models import DANN

            model = DANN(arch=a.arch, num_classes=31, w_bit=bits, a_bit=bits,
                         method="ours", variant="int8")
            result = fit_dann(cfg, loaders, model, max_steps=a.max_steps)
            state = result["state"]
            qp, heads = convert_dann(state.params, state.batch_stats,
                                     weight_bits=bits, act_bits=bits)
            int_fwd = jax.jit(
                lambda q, h, x: dann_int8_forward(q, h, x, act_bits=bits)[0]
            )
            fq_fwd = jax.jit(
                lambda v, x: model.apply(v, x, 0.0, train=False)[0]
            )
        elif a.task == "dsan":
            from alignq_tpu.models import DSAN

            model = DSAN(arch=a.arch, num_classes=31, bottle_neck=True,
                         w_bit=bits, a_bit=bits, method="ours", variant="int8")
            result = fit_dsan(cfg, loaders, model, max_steps=a.max_steps)
            state = result["state"]
            qp, heads = convert_dsan(state.params, state.batch_stats,
                                     weight_bits=bits, act_bits=bits)
            int_fwd = jax.jit(
                lambda q, h, x: dsan_int8_forward(q, h, x, act_bits=bits)
            )
            fq_fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        else:  # mdd
            from alignq_tpu.models.mdd import MDDNet

            model = MDDNet(arch=a.arch, num_classes=31, w_bit=bits,
                           a_bit=bits, method="ours", variant="int8")
            result = fit_mdd(cfg, loaders, model, max_steps=a.max_steps)
            state = result["state"]
            qp, heads = convert_mdd(state.params, state.batch_stats,
                                    weight_bits=bits, act_bits=bits)
            int_fwd = jax.jit(
                lambda q, h, x: mdd_int8_forward(q, h, x, act_bits=bits)
            )
            # prediction head = `outputs` (fit_mdd eval path)
            fq_fwd = jax.jit(
                lambda v, x: model.apply(v, x, 0.0, train=False)[1]
            )
        int_fwd_q = int_fwd
        int_fwd = lambda q, x: int_fwd_q(q, heads, x)  # noqa: E731

    print(f"trained: best_tgt_top1={result['best_tgt_top1']:.2f}")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    correct = fq_correct = agree = total = 0
    for xb, yb in loaders["tgt_test"]:
        x = jnp.asarray(xb)
        y = np.asarray(yb)
        pred_i8 = np.argmax(np.asarray(int_fwd(qp, x)), -1)
        pred_fq = np.argmax(np.asarray(fq_fwd(variables, x)), -1)
        correct += int((pred_i8 == y).sum())
        fq_correct += int((pred_fq == y).sum())
        agree += int((pred_i8 == pred_fq).sum())
        total += len(y)

    print(f"tgt INT{bits} top1: {100*correct/total:.2f}  fake-quant top1: "
          f"{100*fq_correct/total:.2f}  prediction agreement: "
          f"{100*agree/total:.2f}%")
    print(f"deployment accuracy delta (fake-quant - int): "
          f"{100*(fq_correct-correct)/total:+.2f} pts")

    if a.save:
        from alignq_tpu.kernels.artifact import save_int8_artifact

        if a.task == "digit":
            payload = qp  # convert_mnist_dann already bundles trunk + heads
            meta = {"model": "digit_dann", "weight_bits": bits,
                    "act_bits": bits, "act_impl": "erf",
                    "img_size": a.img_size}
        else:
            payload = {"trunk": qp, "heads": heads}
            meta = {"model": a.task, "arch": a.arch, "weight_bits": bits,
                    "act_bits": bits, "act_impl": "erf",
                    "image_size": a.image_size, "num_classes": 31}
            if a.task == "dsan":
                meta["bottle_neck"] = 1
        save_int8_artifact(a.save, payload, meta=meta)
        print(f"saved INT artifact -> {a.save}")


if __name__ == "__main__":
    main()
