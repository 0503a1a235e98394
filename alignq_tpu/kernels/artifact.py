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


def forward_kwargs_from_meta(meta: Dict[str, Any]) -> Dict[str, Any]:
    """Deploy-graph kwargs recorded at export time.

    The fast-path options are TRAINED semantics (poly grid pairs with
    cdf_impl='poly' QAT, int8 stream with stream_int8=True QAT) — deploying
    a model with the wrong graph silently costs accuracy, so the artifact
    records which graph its weights were trained for and this helper turns
    the record back into resnet20_int8_forward/... kwargs."""
    out: Dict[str, Any] = {}
    if "act_bits" in meta:
        out["act_bits"] = int(meta["act_bits"])
    if "act_impl" in meta:
        impl = str(np.asarray(meta["act_impl"]))
        assert impl in ("erf", "poly", "bins", "bins_int"), impl
        out["act_impl"] = impl
    if "stream" in meta:
        s = str(np.asarray(meta["stream"]))
        assert s in ("int16", "int8"), s
        out["stream"] = s
    return out


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
