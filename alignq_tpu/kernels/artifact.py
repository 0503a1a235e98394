"""Persist / load frozen INT8 inference artifacts.

The QAT checkpoint (orbax, train/checkpoint.py) stores f32 master weights;
deployment wants the frozen integer graph. This module serializes the
converted qparams pytree (int8 codes + f32 scales/biases) to a single
.npz — self-contained, framework-agnostic, ~4x smaller than the f32
checkpoint for conv-dominated models.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np


def save_int8_artifact(path: str, qparams: Any, meta: Dict[str, Any] | None = None):
    """Flatten the qparams pytree into an npz keyed by tree path."""
    flat: Dict[str, np.ndarray] = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(qparams)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in kp
        )
        flat[key] = np.asarray(leaf)
    if meta:
        for k, v in meta.items():
            flat[f"__meta__/{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_int8_artifact(path: str, template: Any) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of `template` (a qparams pytree of the
    same model — e.g. from convert_* on fresh params). Returns
    (qparams, meta)."""
    data = np.load(path)
    meta = {
        k.split("/", 1)[1]: data[k] for k in data.files if k.startswith("__meta__/")
    }
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, _ in paths:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in kp
        )
        leaves.append(data[key])
    return jax.tree_util.tree_unflatten(treedef, leaves), meta
