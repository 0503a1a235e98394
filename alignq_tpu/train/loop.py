"""Epoch-based training driver.

Reference: main()/train()/test() in each project's main.py
(/root/reference/cdf_alignment/resnet-20-cifar-10/main.py:36-159, 229-377).
One function instead of 12 copy-pasted drivers; the per-step work is a single
jitted XLA program (train/steps.py) and the host loop only feeds batches and
logs (no per-parameter Python loops, no module-attribute harvesting).
"""

from __future__ import annotations

import math
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from alignq_tpu.data.loader import Data
from alignq_tpu.models import registry as model_registry
from alignq_tpu.train.checkpoint import CheckpointManager
from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.state import create_train_state
from alignq_tpu.train.steps import make_eval_step, make_train_step
from alignq_tpu.utils.logging_utils import MetricWriter, dump_config, get_logger
from alignq_tpu.utils.meters import AverageMeter


def evaluate(eval_step, state, loader, place_batch=None) -> dict:
    meters = {"loss": AverageMeter(), "top1": AverageMeter(), "top5": AverageMeter()}
    for xb, yb in loader:
        batch = (jnp.asarray(xb), jnp.asarray(yb))
        if place_batch is not None:
            batch = place_batch(batch)
        m = eval_step(state, *batch)
        for k, meter in meters.items():
            meter.update(float(m[k]), len(yb))
    return {k: meter.avg for k, meter in meters.items()}


def _build_distributed(cfg: TrainConfig, model, state):
    """Mesh + step builders for multi-device training (VERDICT.md next-round
    item 1: cfg.mesh_shape/corr_mode/grad_compression become live knobs).

    Returns (mesh, state, train_step, place_train, place_eval):
    - corr_mode='gather': the single-device step jitted over the mesh; GSPMD
      inserts the all-gathers for the global-batch corr matrices and the
      gradient all-reduce (exact reference math; dist/corr.py module doc).
    - corr_mode='local': shard_map step with per-shard block-diagonal corr and
      per-shard duals, explicit compressed gradient pmean
      (cfg.grad_compression -> dist/collectives.py).
    - a 'model' axis of size > 1 (e.g. --mesh 4 2) additionally shards conv/
      dense kernels on output channels (dist/sharding.py param_shardings) —
      tensor-parallel QAT training; GSPMD propagates the layout through the
      step and places the channel collectives (gather mode only: 'local'
      shards duals over the data axis and is DP-specific).
    """
    from alignq_tpu.dist import make_mesh, shard_batch
    from alignq_tpu.dist import multihost
    from alignq_tpu.dist.corr import create_local_duals, make_local_corr_train_step

    mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
    n_data = mesh.shape[cfg.mesh_axes[0]]
    if cfg.train_batch_size % n_data:
        raise ValueError(
            f"train_batch_size {cfg.train_batch_size} not divisible by "
            f"data-axis size {n_data}"
        )

    if multihost.active():
        # per-process input pipeline: every host's seeded loader yields the
        # same global batch; each keeps only its contiguous row shard and
        # the global array is assembled without cross-host data motion
        # (dist/multihost.py)
        def place_train(batch):
            return multihost.place_batch_multihost(batch, mesh, cfg.mesh_axes[0])

        def place_eval(batch):
            if batch[0].shape[0] % n_data == 0:
                return place_train(batch)
            # uneven tail batch: replicate (every host provides the full
            # batch, so the global array is consistent by construction)
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(rep, x), batch
            )
    else:
        def place_train(batch):
            return shard_batch(batch, mesh, cfg.mesh_axes[0])

        def place_eval(batch):
            # shard eval batches when they divide evenly; replicate otherwise
            if batch[0].shape[0] % n_data == 0:
                return place_train(batch)
            return batch

    n_model = dict(mesh.shape).get("model", 1)
    if n_model > 1:
        if cfg.corr_mode != "gather":
            raise ValueError(
                "tensor-parallel training (model axis > 1) requires "
                "corr_mode='gather'; 'local' shards corr duals over the "
                "data axis only"
            )
        from alignq_tpu.dist.sharding import param_shardings

        state = state.replace(
            params=jax.device_put(
                state.params, param_shardings(state.params, mesh)
            )
        )

    if cfg.corr_mode == "local":
        if cfg.admm:
            # per-shard duals: (n_data, B_local, B_local) per site
            duals = create_local_duals(
                jax.random.PRNGKey(cfg.seed + 1),
                sorted(state.admm_duals),
                cfg,
                n_data,
            )
            state = state.replace(admm_duals=duals)
        train_step = make_local_corr_train_step(model, cfg, mesh, cfg.mesh_axes[0])
    elif cfg.corr_mode == "gather":
        train_step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    else:
        raise ValueError(f"unknown corr_mode {cfg.corr_mode!r}")
    return mesh, state, train_step, place_train, place_eval


def fit(
    cfg: TrainConfig,
    data: Data,
    model=None,
    resume: bool = False,
    max_steps: Optional[int] = None,
    pretrained_dir: Optional[str] = None,
) -> dict:
    """Train per config; returns {'best_top1', 'best_top5', 'state'}."""
    from alignq_tpu.dist import multihost

    # primary-host observability (dist/multihost.py): secondary processes
    # log warnings+ to their own file and skip metric writing; orbax
    # checkpointing below stays COLLECTIVE (all processes call save — orbax
    # writes each process's addressable shards, process 0 the metadata)
    primary = multihost.is_primary()
    log_name = "logger.log" if primary else f"logger.p{jax.process_index()}.log"
    logger = get_logger(f"{cfg.job_dir}/{log_name}")
    if not primary:
        import logging

        logger.setLevel(logging.WARNING)

    class _NullWriter:
        def write(self, *a, **k):
            pass

    writer_train = MetricWriter(cfg.job_dir, "train") if primary else _NullWriter()
    writer_test = MetricWriter(cfg.job_dir, "test") if primary else _NullWriter()
    if primary:
        # args dump ≙ reference config.txt (utils/common.py:49-54)
        dump_config(cfg, cfg.job_dir)

    eval_model = model
    if model is None:
        model = model_registry.build_model(cfg)
        eval_model = model
        if cfg.mxu_bf16:
            # Mixed-precision QAT (VERDICT.md round-2 item 5): the TRAIN step
            # runs bf16-MXU convs (2.8x the f32-HIGHEST step,
            # ARCHITECTURE.md QAT breakdown) while eval — and any export from
            # the trained params — runs the f32-HIGHEST forward on the SAME
            # params. Deploy-exact train==deploy agreement is a property of
            # the (eval forward, INT graph) pair, and round 2's 6.6-pt W4A4
            # loss came from the EVAL forward silently using bf16 MXU passes;
            # measured with tools/export_int8.py --mxu_bf16.
            import dataclasses

            eval_model = model_registry.build_model(
                dataclasses.replace(cfg, mxu_bf16=False)
            )

    steps_per_epoch = len(data.loader_train)
    rng = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(
        rng, model, cfg, input_shape=(1, *data.loader_test.x.shape[1:]),
        steps_per_epoch=steps_per_epoch,
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(
        f"model={cfg.target_model} method={cfg.method} W{cfg.bitW}A{cfg.abitW} "
        f"admm={cfg.admm} params={n_params:,} steps/epoch={steps_per_epoch}"
    )

    if pretrained_dir:
        # partial warm-start from another run (reference main.py:62-82);
        # optimizer/duals stay fresh
        from alignq_tpu.train.pretrained import load_pretrained

        state = load_pretrained(state, pretrained_dir)

    mesh = None
    place_train = place_eval = None
    if math.prod(cfg.mesh_shape) > 1:
        mesh, state, train_step, place_train, place_eval = _build_distributed(
            cfg, model, state
        )
        logger.info(
            f"mesh {dict(zip(cfg.mesh_axes, cfg.mesh_shape))} "
            f"corr_mode={cfg.corr_mode} grad_compression={cfg.grad_compression}"
        )
    else:
        train_step = jax.jit(make_train_step(model, cfg), donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(eval_model, cfg))

    ckpt = CheckpointManager(
        cfg.job_dir, max_to_keep=1 if cfg.best_only_checkpoint else 3
    )
    start_epoch = 0
    if resume:
        # restore AFTER any local-duals reshape so the checkpoint template
        # (per-shard (n_data, Bl, Bl) duals in 'local' mode) matches
        state, start_epoch = ckpt.restore(state)
        logger.info(f"resumed from epoch {start_epoch}")

    best = {"top1": 0.0, "top5": 0.0}
    total_steps = 0
    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        loss_m, acc_m = AverageMeter(), AverageMeter()
        for i, (xb, yb) in enumerate(data.loader_train, 1):
            batch = (jnp.asarray(xb), jnp.asarray(yb))
            if place_train is not None:
                batch = place_train(batch)
            state, metrics = train_step(state, *batch)
            total_steps += 1
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                # failure detection (reference has none — SURVEY.md section
                # 5): stop instead of training on garbage; the last good
                # checkpoint supports --resume
                logger.error(
                    f"non-finite loss at epoch {epoch} step {i} — aborting "
                    f"(resume from the last checkpoint with resume=True)"
                )
                ckpt.wait()
                return {
                    "best_top1": best["top1"], "best_top5": best["top5"],
                    "state": state, "aborted": "non_finite_loss",
                }
            loss_m.update(loss_val, len(yb))
            acc_m.update(float(metrics["accuracy"]) * 100, len(yb))
            if i % cfg.print_freq == 0:
                logger.info(
                    f"Epoch[{epoch}]({i}/{steps_per_epoch}) "
                    f"loss {loss_m.val:.4f} ({loss_m.avg:.4f}) "
                    f"top1 {acc_m.val:.2f} ({acc_m.avg:.2f})"
                )
                writer_train.write(
                    int(state.step), {"loss": loss_m.val, "top1": acc_m.val}
                )
            if max_steps is not None and total_steps >= max_steps:
                break

        if (epoch + 1) % cfg.eval_freq_epochs == 0 or epoch == cfg.num_epochs - 1:
            em = evaluate(eval_step, state, data.loader_test, place_batch=place_eval)
            em["top1"] *= 100
            em["top5"] *= 100
            is_best = em["top1"] > best["top1"]
            best["top1"] = max(best["top1"], em["top1"])
            best["top5"] = max(best["top5"], em["top5"])
            logger.info(
                f"Epoch[{epoch}] eval top1 {em['top1']:.3f} top5 {em['top5']:.3f} "
                f"(best {best['top1']:.3f}) [{time.time()-t0:.1f}s]"
            )
            writer_test.write(int(state.step), em)
            ckpt.save(epoch + 1, state, metrics=em)

        if max_steps is not None and total_steps >= max_steps:
            break

    ckpt.wait()
    logger.info(f"Best @prec1: {best['top1']:.3f} @prec5: {best['top5']:.3f}")
    return {"best_top1": best["top1"], "best_top5": best["top5"], "state": state}
