"""Model compression-rate reporting.

Reference: compressionInfo in
/root/reference/cdf_alignment/resnet-20-cifar-10/main.py:162-226 (mostly
dead code there — counts conv params and bits, rate = 32*params / total
bits, excluding the first conv). Implemented live here over a params
pytree; supports per-block mixed precision via a bits_fn.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def compression_info(
    params,
    w_bit: int = 8,
    bits_fn: Callable[[str], int] | None = None,
    include_first: bool = False,
) -> dict:
    """Compression rate of the conv weights (reference main.py:174-203).

    bits_fn: optional path -> bits override (mixed precision); default
    constant w_bit. The reference drops the first conv from the bit count
    (main.py:185 convs[1:]); include_first=True keeps it.
    """
    convs = []
    for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        keys = [str(getattr(p, "key", getattr(p, "name", p))) for p in kp]
        if keys and keys[-1] == "kernel" and getattr(leaf, "ndim", 0) == 4:
            convs.append(("/".join(keys), leaf))
    if not include_first:
        counted = convs[1:]
    else:
        counted = convs
    total_params = sum(int(np.prod(l.shape)) for _, l in convs)
    total_bits = sum(
        int(np.prod(l.shape)) * (bits_fn(path) if bits_fn else w_bit)
        for path, l in counted
    )
    fp32_bits = total_params * 32
    return {
        "conv_params": total_params,
        "fp32_bits": fp32_bits,
        "quant_bits": total_bits,
        "compression_rate": fp32_bits / max(total_bits, 1),
        "num_conv_layers": len(convs),
    }
