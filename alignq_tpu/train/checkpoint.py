"""Orbax checkpointing of the full train state.

Reference: utils/common.py:29-61 `checkpoint` class (per-epoch model_{e}.pt +
model_best.pt copy) and the resume path (main.py:98-111). The saved payload
matches the reference's: params, batch stats, optimizer state (momentum
buffers), ADMM duals, step/epoch and best metrics — so ADMM dual state
survives restarts (SURVEY.md section 5 checkpoint entry).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from alignq_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, job_dir: str, max_to_keep: int = 3):
        self.dir = os.path.abspath(os.path.join(job_dir, "checkpoint"))
        os.makedirs(self.dir, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, best_fn=lambda m: m.get("top1", 0.0)
        )
        self.mgr = ocp.CheckpointManager(self.dir, options=options)

    def save(self, epoch: int, state: TrainState, metrics: Optional[dict] = None):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "admm_duals": state.admm_duals,
            "step": state.step,
        }
        self.mgr.save(
            epoch,
            args=ocp.args.StandardSave(payload),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def restore(self, state: TrainState, epoch: Optional[int] = None) -> tuple[TrainState, int]:
        """Restore into an abstract state of the same structure; returns
        (state, start_epoch)."""
        if epoch is None:
            epoch = self.mgr.latest_step()
        if epoch is None:
            return state, 0
        template = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "admm_duals": state.admm_duals,
            "step": state.step,
        }
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        restored = self.mgr.restore(epoch, args=ocp.args.StandardRestore(abstract))
        new_state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            admm_duals=restored["admm_duals"],
            step=restored["step"],
        )
        return new_state, int(epoch)

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.close()
