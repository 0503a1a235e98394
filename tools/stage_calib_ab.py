"""StageRequant calibration A/B: monotone-max vs EMA vs percentile-EMA
(VERDICT r4 item 7 / weak #4).

The int8 stage buffer's per-channel scale comes from a calibrated running
statistic (nn/layers.py StageRequant). Round 4 shipped the monotone
running max — deterministic and an upper bound, but one early-training
outlier permanently inflates the scale and wastes int8 code range. This
harness measures that on a DELIBERATELY noisy QAT run: DenseNet-40
stage_int8 QAT on synthetic CIFAR where one early batch is scaled by
--spike (an activation transient like those of real warmup), then
compares per calibrator:

- QAT fake-quant eval top-1;
- true-INT8 stage-buffer deployment top-1 + prediction agreement
  (tools/export_int8.py protocol — the number that detects scale waste:
  an inflated scale quantizes the real signal onto fewer codes);
- scale inflation: mean/max ratio of each calibrator's final amax to the
  spike-free monotone-max run's amax (the reference statistic).

Reference: the buffer VALUES are dense-cifar-10/model/densenet.py:31-41's
concatenated features; calibration is framework-native (the reference has
no int8 deployment). DP semantics of the stat are tested separately
(tests/test_stage_int8.py::test_dp_pmax_combine_matches_global).

    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python \
        tools/stage_calib_ab.py --epochs 3            # CPU, ~15 min
    timeout 3600 python tools/stage_calib_ab.py       # ambient -> TPU

Prints one JSON line per calibrator and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


class SpikeLoader:
    """Wraps an ArrayLoader; multiplies one batch of the first epoch by
    `spike` (injected activation transient)."""

    def __init__(self, inner, spike: float, at_batch: int = 1):
        self.inner = inner
        self.spike = spike
        self.at_batch = at_batch
        self._epoch = 0

    def __len__(self):
        return len(self.inner)

    def __iter__(self):
        self._epoch += 1
        for i, (x, y) in enumerate(self.inner):
            if self._epoch == 1 and i == self.at_batch:
                yield x * self.spike, y
            else:
                yield x, y


def amax_leaves(batch_stats):
    import jax

    out = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(batch_stats)[0]:
        keys = [str(getattr(p, "key", "")) for p in kp]
        if keys[-1] == "amax":
            out["/".join(keys[:-1])] = np.asarray(leaf)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--spike", type=float, default=8.0)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--max_steps", type=int, default=None)
    ap.add_argument("--calibs", default="max,ema,ema_p999")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from alignq_tpu.data.registry import get_data
    from alignq_tpu.kernels.infer_densenet import (
        convert_densenet40,
        densenet40_int8_forward,
    )
    from alignq_tpu.models import densenet_40_quant
    from alignq_tpu.train import TrainConfig
    from alignq_tpu.train.loop import fit

    import functools

    results = {}
    baseline_amax = None
    # the spike-free monotone-max run provides the reference amax scales
    for tag, spike, calib_list in (
        ("clean", 1.0, ["max"]),
        ("spiked", a.spike, a.calibs.split(",")),
    ):
        for calib in calib_list:
            cfg = TrainConfig(
                target_model="densenet_40_quant", method="ours",
                bitW=a.bits, abitW=a.bits, variant="int8",
                dataset="synthetic", num_epochs=a.epochs,
                train_batch_size=a.batch, eval_batch_size=a.batch,
                job_dir=f"/tmp/stage_calib_{tag}_{calib}", print_freq=10000,
                correction_exclude=(), deploy_exact=True, stage_int8=True,
            )
            data = get_data(cfg.dataset, "/tmp", cfg.train_batch_size,
                            cfg.eval_batch_size, cfg.seed)
            data.loader_train = SpikeLoader(data.loader_train, spike)
            model = densenet_40_quant(
                bitW=a.bits, abitW=a.bits, method="ours", variant="int8",
                deploy_exact=True, stage_int8=True, stage_calib=calib,
            )
            res = fit(cfg, data, model=model, max_steps=a.max_steps)
            state = res["state"]

            qp = convert_densenet40(
                state.params, state.batch_stats,
                weight_bits=a.bits, act_bits=a.bits, stage_int8=True,
            )
            int_fwd = jax.jit(functools.partial(
                densenet40_int8_forward, stage_int8=True))
            fq_fwd = jax.jit(lambda v, x, model=model: model.apply(
                v, x, train=False))
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            correct = fq_correct = agree = total = 0
            for xb, yb in data.loader_test:
                x = jnp.asarray(xb)
                y = np.asarray(yb)
                p_i8 = np.argmax(np.asarray(int_fwd(qp, x)), -1)
                p_fq = np.argmax(np.asarray(fq_fwd(variables, x)), -1)
                correct += int((p_i8 == y).sum())
                fq_correct += int((p_fq == y).sum())
                agree += int((p_i8 == p_fq).sum())
                total += len(y)

            am = amax_leaves(state.batch_stats)
            if tag == "clean":
                baseline_amax = am
                key = "clean_max"
            else:
                key = calib
            infl = []
            if baseline_amax is not None:
                for site, v in am.items():
                    ref = baseline_amax[site]
                    infl.append(float(np.mean(v / np.maximum(ref, 1e-9))))
            row = {
                "calib": key, "spike": spike,
                "qat_top1": round(res["best_top1"], 2),
                "int8_top1": round(100 * correct / total, 2),
                "fq_top1": round(100 * fq_correct / total, 2),
                "agreement_pct": round(100 * agree / total, 2),
                "amax_inflation_mean": round(float(np.mean(infl)), 3)
                if infl else 1.0,
                "amax_inflation_max": round(float(np.max(infl)), 3)
                if infl else 1.0,
            }
            results[key] = row
            print(json.dumps(row), flush=True)

    print(json.dumps({"summary": {
        k: {"agreement_pct": v["agreement_pct"],
            "amax_inflation_mean": v["amax_inflation_mean"]}
        for k, v in results.items()}}), flush=True)


if __name__ == "__main__":
    main()
