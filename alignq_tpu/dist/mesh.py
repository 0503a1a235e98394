"""Device mesh construction.

No reference equivalent — the reference is single-GPU
(/root/reference/cdf_alignment/resnet-20-cifar-10/main.py:28 uses only
gpus[0]; SURVEY.md section 2.1). TPU-native scaling: a ('data', 'model')
mesh; DP batch sharding for QAT, optional 'model' axis for weight-sharded
inference. Collectives are inserted by XLA from sharding annotations and
ride ICI within a slice.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Sequence[int] | None = None,
    axes: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a Mesh. Default: all devices on the 'data' axis, model=1."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, tuple(axes))
