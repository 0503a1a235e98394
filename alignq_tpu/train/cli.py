"""Command-line training entry point.

Reference: `python3 main.py --method ours --bitW 8 ...`
(/root/reference/README.md:24-31); flag names kept compatible where they
exist (utils/options.py:31-90), parsed into the typed TrainConfig.

Usage:
    python -m alignq_tpu.train.cli --target_model resnet20_quant \
        --method ours --bitW 8 --abitW 8 --lr 0.04 --train_batch_size 128
"""

from __future__ import annotations

import argparse
import dataclasses

from alignq_tpu.data.registry import get_data
from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.loop import fit


def parse_args(argv=None) -> TrainConfig:
    p = argparse.ArgumentParser(description="AlignQ-TPU trainer")
    defaults = TrainConfig()
    p.add_argument("--target_model", default=defaults.target_model)
    p.add_argument("--method", default=defaults.method)
    p.add_argument("--bitW", type=int, default=defaults.bitW)
    p.add_argument("--abitW", type=int, default=defaults.abitW)
    p.add_argument("--act_range", type=float, default=defaults.act_range)
    p.add_argument("--lr", type=float, default=defaults.lr)
    p.add_argument("--momentum", type=float, default=defaults.momentum)
    p.add_argument("--weight_decay", type=float, default=defaults.weight_decay)
    p.add_argument("--num_epochs", type=int, default=defaults.num_epochs)
    p.add_argument("--train_batch_size", type=int, default=defaults.train_batch_size)
    p.add_argument("--eval_batch_size", type=int, default=defaults.eval_batch_size)
    # note: the reference's --lr_decay_steps used type=list and could not
    # parse its own README command (options.py:74, SURVEY.md section 2.4.5);
    # here it is a proper int list.
    p.add_argument("--lr_decay_steps", type=int, nargs="+", default=list(defaults.lr_decay_steps))
    p.add_argument("--lr_gamma", type=float, default=defaults.lr_gamma)
    p.add_argument("--lam", type=float, default=defaults.lam)
    p.add_argument("--lam2", type=float, default=defaults.lam2)
    p.add_argument("--admm", action="store_true")
    # distributed execution (VERDICT.md item 1: these knobs are live)
    p.add_argument(
        "--mesh", type=int, nargs="+", default=None, metavar="N",
        help="device mesh shape, e.g. --mesh 8 (data-parallel) or "
             "--mesh 4 2 (data x model)",
    )
    p.add_argument(
        "--corr_mode", choices=("gather", "local"), default=defaults.corr_mode,
        help="ADMM corr under DP: 'gather' = exact global-batch (GSPMD "
             "all-gather), 'local' = per-shard block-diagonal duals",
    )
    p.add_argument(
        "--grad_compression", choices=("f32", "bf16", "int8_gather"),
        default=defaults.grad_compression,
        help="gradient all-reduce wire format (corr_mode=local path)",
    )
    p.add_argument("--mxu_bf16", action="store_true",
                   help="cast conv operands to bf16 for full MXU rate")
    # multi-host execution (dist/multihost.py; SURVEY.md section 7 item 7).
    # On a TPU pod slice --multihost alone auto-detects the topology; for
    # manual/localhost launches pass the rendezvous triple (or set
    # ALIGNQ_COORDINATOR / ALIGNQ_NUM_PROCESSES / ALIGNQ_PROCESS_ID).
    p.add_argument(
        "--multihost", action="store_true",
        help="join a jax.distributed multi-process rendezvous before "
             "training; --mesh then spans the GLOBAL device set",
    )
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument(
        "--cdf_impl", choices=("erf", "poly"), default=defaults.cdf_impl,
        help="act-site CDF: 'erf' reference-exact, 'poly' TPU fast grid "
             "(quant/cdf.py ERF_SQRT2_POLY; deploy with act_impl='poly')",
    )
    p.add_argument(
        "--variant", default=defaults.variant,
        help="quantizer grid: 'b' reference, 'a' raw-Phi, 'int8' deploy grid",
    )
    p.add_argument(
        "--deploy_exact", action="store_true",
        help="model the INT graph's stem/residual requant sites in QAT "
             "(PreActResNet / MobileNetV2 / DenseNet-40; pair with "
             "--variant int8)",
    )
    p.add_argument(
        "--stream_int8", action="store_true",
        help="with --deploy_exact: train the int8-stored residual stream "
             "edge semantics (deploy with stream='int8' — half the stream "
             "HBM bytes)",
    )
    p.add_argument("--dataset", default=defaults.dataset)
    p.add_argument("--data_dir", default=defaults.data_dir)
    p.add_argument("--job_dir", default=defaults.job_dir)
    p.add_argument("--seed", type=int, default=defaults.seed)
    p.add_argument("--print_freq", type=int, default=defaults.print_freq)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--pretrained", default=None, metavar="JOB_DIR",
        help="warm-start params from another run's checkpoint (partial "
             "merge — reference --pretrained/--source_file, main.py:62-82)",
    )
    p.add_argument("--max_steps", type=int, default=None, help="early stop for smoke runs")
    p.add_argument(
        "--no_correction", action="store_true",
        help="disable the PDF gradient correction (plain SGD for all "
             "params). This is ALSO the committed reference's effective "
             "behavior — its correction is assigned to a discarded p.grad "
             "(SURVEY.md 2.4.7; verified head-to-head by "
             "tools/reference_parity.py) — so the flag doubles as the "
             "committed-semantics ablation",
    )
    a = p.parse_args(argv)
    if a.multihost or a.coordinator:
        # must run before the first JAX operation of the process
        from alignq_tpu.dist import multihost

        multihost.initialize(a.coordinator, a.num_processes, a.process_id)
    a.use_correction = not a.no_correction
    field_names = {f.name for f in dataclasses.fields(TrainConfig)}
    overrides = {k: v for k, v in vars(a).items() if k in field_names}
    if a.mesh is not None:
        overrides["mesh_shape"] = tuple(a.mesh)
        overrides["mesh_axes"] = ("data", "model")[: len(a.mesh)]
    cfg = TrainConfig(**overrides)
    return cfg, a.resume, a.max_steps, a.pretrained


def main(argv=None):
    cfg, resume, max_steps, pretrained = parse_args(argv)
    data = get_data(
        cfg.dataset, cfg.data_dir, cfg.train_batch_size, cfg.eval_batch_size, cfg.seed
    )
    result = fit(cfg, data, resume=resume, max_steps=max_steps,
                 pretrained_dir=pretrained)
    print(f"best_top1={result['best_top1']:.3f} best_top5={result['best_top5']:.3f}")
    return result


if __name__ == "__main__":
    main()
