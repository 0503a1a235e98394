"""Sharding rules for params and batches.

DP: batch dim sharded over 'data'. TP (weight-sharded inference /
megabatch training): conv kernels sharded on the output-channel axis
(HWIO last dim) and dense kernels on the output dim over 'model' — the
conv/matmul then produces output sharded on channels and XLA inserts the
all-gather/reduce-scatter pair where a following layer needs replicated
channels (scaling-book recipe: annotate, let XLA place collectives).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def shard_batch(batch: Any, mesh: Mesh, data_axis: str = "data") -> Any:
    sh = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def param_shardings(
    params: Any, mesh: Mesh, model_axis: str = "model", shard_model: bool = True
) -> Any:
    """NamedSharding pytree for params: output-channel TP over `model_axis`.

    Kernels whose output dim is not divisible by the axis size stay
    replicated (XLA requires even shards for named sharding)."""
    axis_size = mesh.shape[model_axis]

    def rule(path, leaf):
        if not shard_model or axis_size == 1:
            return NamedSharding(mesh, P())
        last = str(getattr(path[-1], "key", ""))
        if last == "kernel" and leaf.ndim == 4 and leaf.shape[-1] % axis_size == 0:
            return NamedSharding(mesh, P(None, None, None, model_axis))
        if last == "kernel" and leaf.ndim == 2 and leaf.shape[-1] % axis_size == 0:
            return NamedSharding(mesh, P(None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def qparams_shardings(qparams: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    """NamedSharding pytree for frozen INT8 graph params (kernels/infer*):
    int8 conv kernels (HWIO, ndim 4) shard on output channels over
    `model_axis` when divisible; per-channel scales/biases and everything
    else replicate (XLA re-shards the epilogue locally). A mesh without a
    `model_axis` axis (pure-DP serving) replicates everything."""
    axis_size = dict(mesh.shape).get(model_axis, 1)

    def rule(leaf):
        if (
            axis_size > 1
            and getattr(leaf, "ndim", 0) == 4
            and leaf.shape[-1] % axis_size == 0
        ):
            return NamedSharding(mesh, P(None, None, None, model_axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, qparams)


def place_qparams(qparams: Any, mesh: Mesh, model_axis: str = "model") -> Any:
    sh = qparams_shardings(qparams, mesh, model_axis)
    return jax.tree.map(jax.device_put, qparams, sh)
