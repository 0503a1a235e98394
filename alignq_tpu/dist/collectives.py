"""Quantized / compressed cross-device reductions.

No reference equivalent (single GPU). TPU-native rationale: DP gradient
all-reduce is the dominant ICI traffic in data-parallel QAT; compressing the
wire format trades a little gradient precision for bandwidth (cf. EQuARX,
arXiv:2506.17615 — quantized all-reduce inside XLA; here we compose the
same idea from JAX collectives).

Modes:
- 'f32'        : plain psum (baseline).
- 'bf16'       : psum in bfloat16 — halves bytes on the wire, XLA reduces
                 in bf16 (accumulation error ~1e-3 relative).
- 'int8_gather': symmetric per-tensor int8 quantization + all_gather of the
                 int8 shards + local f32 reduction. Wire bytes per device:
                 (n-1) * size * 1B  vs  ~2 * size * 4B for ring psum —
                 a win for n <= 8 devices; exact-scale dequant, so the only
                 error is the int8 rounding of each shard's contribution.

All modes are usable inside shard_map/pmap bodies (they use axis names).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compressed_pmean(x: jax.Array, axis_name: str, mode: str = "f32") -> jax.Array:
    """Mean-reduce x over `axis_name` with the selected wire compression."""
    n = jax.lax.psum(1, axis_name)
    if mode == "f32":
        return jax.lax.pmean(x, axis_name)
    if mode == "bf16":
        return jax.lax.psum(x.astype(jnp.bfloat16), axis_name).astype(x.dtype) / n
    if mode == "int8_gather":
        # per-tensor symmetric scale agreed across devices via pmax so every
        # shard dequantizes identically
        local_max = jnp.max(jnp.abs(x))
        scale = jax.lax.pmax(local_max, axis_name) / 127.0
        scale = jnp.maximum(scale, 1e-30)
        q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
        gathered = jax.lax.all_gather(q, axis_name)  # (n, ...)
        total = jnp.sum(gathered.astype(jnp.float32), axis=0) * scale
        return (total / n).astype(x.dtype)
    raise ValueError(f"unknown compression mode {mode!r}")


def compressed_tree_pmean(tree, axis_name: str, mode: str = "f32"):
    """compressed_pmean over every leaf of a pytree (e.g. a grad tree)."""
    return jax.tree.map(lambda x: compressed_pmean(x, axis_name, mode), tree)
