"""Local-vs-gather ADMM corr mode: the multi-epoch ACCURACY A/B.

SURVEY.md section 5 (long-context entry) mandates measuring the accuracy
delta between the two distributed corr semantics, not just their
mechanics (VERDICT r3 missing #3):

- 'gather': the corr matrices are global-batch B x B — GSPMD all-gathers
  the flattened features per quant site; exact reference math
  (cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:115-122
  computes corr over the full train batch; duals sized B^2,
  utils/admm.py:21-22).
- 'local': per-shard B_local x B_local matrices with per-shard duals —
  zero corr-path communication, mathematically a block-diagonal
  approximation of the reference's matrix (dist/corr.py).

This runs the SAME W4A4+ADMM ResNet-20 QAT config three ways on the
8-virtual-device CPU mesh — single-device, gather, local — from the same
init/data stream, and reports per-epoch test top-1 curves, final/best
top-1, and the mean trans loss. The numbers go to ARCHITECTURE.md
("corr mode accuracy A/B") with the default-mode recommendation.

Usage (CPU, background, ~30-60 min at defaults):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/corr_mode_ab.py [--epochs 20] [--batch 128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    import jax

    from alignq_tpu.data.registry import get_data
    from alignq_tpu.train import TrainConfig
    from alignq_tpu.train.loop import fit

    assert len(jax.devices()) >= 8, "run with 8 virtual devices (XLA_FLAGS)"

    def one(mode: str, mesh):
        job = tempfile.mkdtemp(prefix=f"corr_ab_{mode}_")
        cfg = TrainConfig(
            target_model="resnet20_quant", method="ours", bitW=a.bits,
            abitW=a.bits, admm=True, lr=a.lr, num_epochs=a.epochs,
            train_batch_size=a.batch, eval_batch_size=a.batch,
            lr_decay_steps=(int(a.epochs * 0.5), int(a.epochs * 0.75)),
            job_dir=job, print_freq=10**6, seed=a.seed,
            mesh_shape=mesh, mesh_axes=("data",),
            corr_mode=mode if mode != "single" else "gather",
        )
        data = get_data("synthetic", "/tmp", a.batch, a.batch, a.seed)
        result = fit(cfg, data)
        curve = []
        with open(os.path.join(job, "run", "test.jsonl")) as f:
            for line in f:
                curve.append(json.loads(line)["top1"])
        # mean trans loss from the train stream would need print_freq=1;
        # report final duals magnitude instead (annealing indicator)
        state = result["state"]
        dual_mag = float(
            sum(
                abs(v.gamma).mean()
                for v in jax.tree.leaves(
                    state.admm_duals, is_leaf=lambda x: hasattr(x, "gamma")
                )
            )
            / max(len(state.admm_duals), 1)
        )
        to100 = next((i + 1 for i, c in enumerate(curve) if c >= 100.0), None)
        rec = {
            "mode": mode, "mesh": list(mesh),
            "final_top1": round(curve[-1], 2),
            "best_top1": round(result["best_top1"], 2),
            # the synthetic task saturates, so convergence SPEED is the
            # discriminative signal (CORR_MODE_AB_r4.json)
            "epochs_to_100": to100,
            "curve": [round(c, 2) for c in curve],
            "mean_gamma_mag": round(dual_mag, 5),
        }
        print(json.dumps(rec), flush=True)
        return rec

    rows = [
        one("single", (1,)),
        one("gather", (8,)),
        one("local", (8,)),
    ]
    gather = next(r for r in rows if r["mode"] == "gather")
    local = next(r for r in rows if r["mode"] == "local")
    single = next(r for r in rows if r["mode"] == "single")
    print(json.dumps({
        "summary": True,
        "epochs": a.epochs, "batch": a.batch, "bits": a.bits,
        "single_best": single["best_top1"],
        "gather_best": gather["best_top1"],
        "local_best": local["best_top1"],
        "local_minus_gather_final_pts": round(
            local["final_top1"] - gather["final_top1"], 2),
        "local_minus_gather_best_pts": round(
            local["best_top1"] - gather["best_top1"], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
