"""Partial pretrained-weight loading.

Reference: main.py:62-82 — loads a source checkpoint's state dict and merges
only the keys present in the target model (partial merge), so e.g. a 4-bit
run warm-starts from the 8-bit run's weights (quantizer state is stateless,
SURVEY.md section 5 checkpoint entry) and a quantized model can initialize
from an FP32 pretrain. Every hard reference config does this
(--pretrained/--source_file; MobileNet diverges without it —
ARCHITECTURE.md sweep).

Here the merge is by tree path AND shape: leaves present in both trees with
matching shapes are taken from the source; everything else keeps the fresh
init. Optimizer state and ADMM duals are NOT loaded (fresh optimizer, as in
the reference's non-resume path).
"""

from __future__ import annotations

import logging
from typing import Any, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)


def _flatten(tree: Any) -> dict:
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in kp
        )
        flat[key] = leaf
    return flat


def merge_pretrained(target: Any, source: Any) -> Tuple[Any, int, int]:
    """Return (merged_tree, n_merged, n_total) — reference main.py:75-79."""
    src_flat = _flatten(source)
    merged_count = 0
    total = 0

    def merge_leaf(kp, leaf):
        nonlocal merged_count, total
        total += 1
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in kp
        )
        cand = src_flat.get(key)
        if cand is not None and tuple(np.shape(cand)) == tuple(np.shape(leaf)):
            merged_count += 1
            return jax.numpy.asarray(cand)
        return leaf

    merged = jax.tree_util.tree_map_with_path(merge_leaf, target)
    return merged, merged_count, total


def load_pretrained(state, source_job_dir: str):
    """Warm-start a TrainState's params/batch_stats from another run's
    latest checkpoint (partial merge; optimizer/duals stay fresh).

    The source is restored RAW (no structure template) so the source run may
    have a different config — different bit width, admm on/off, even a
    different head — exactly like the reference's partial state-dict merge."""
    import os

    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(os.path.join(source_job_dir, "checkpoint"))
    mgr = ocp.CheckpointManager(ckpt_dir)
    try:
        epoch = mgr.latest_step()
        if epoch is None:
            log.warning("no checkpoint under %s — keeping fresh init", source_job_dir)
            return state
        raw = mgr.restore(epoch)
    finally:
        mgr.close()
    params, n, total = merge_pretrained(state.params, raw["params"])
    bs, nb, _ = merge_pretrained(state.batch_stats, raw.get("batch_stats", {}))
    log.info("pretrained merge: %d/%d param leaves + %d batch-stat leaves from %s",
             n, total, nb, source_job_dir)
    return state.replace(params=params, batch_stats=bs)
