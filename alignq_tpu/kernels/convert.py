"""Convert trained fake-quant params to the true-INT8 inference form.

QAT (fake-quant) and inference share weights (reference stores f32 master
weights and re-quantizes each forward, r20/model/quantization.py:118); this
module freezes them once:

- weight: c = 2*Phi_{mean(w),std(w)}(w) - 1; q = round(c * 127) int8;
  dequant scale 1/127. (The training grid round(c*(2^k-1))/(2^k-1) over
  [-1,1] has 2n+1 levels — effectively k+1 bits; the INT8 form uses the
  canonical symmetric 127 grid and folds the delta into accuracy tests.
  SURVEY.md section 2.4.6.)
- BatchNorm folding: y = gamma*(conv - mu)/sqrt(var+eps) + beta becomes a
  per-channel (scale, bias) epilogue on the int32 accumulator:
      scale_c = act_scale * w_scale * gamma_c / sqrt(var_c + eps)
      bias_c  = beta_c - gamma_c * mu_c / sqrt(var_c + eps)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alignq_tpu.quant.cdf import gaussian_cdf, tensor_stats

W_SCALE = 1.0 / 127.0


def grid_max(bits: int) -> int:
    """Symmetric code bound: 127 for int8, 7 for int4 (2^{b-1}-1)."""
    return 2 ** (bits - 1) - 1


class QConvInt8(NamedTuple):
    kernel_int8: jax.Array  # HWIO integer codes (int8 storage, any bit width)
    scale: jax.Array  # (Cout,) fused dequant * BN scale
    bias: jax.Array  # (Cout,) fused BN shift


def quantize_weight_int8(w: jax.Array, bits: int = 8, channelwise: bool = False) -> jax.Array:
    """CDF-align then symmetric integer codes (per-tensor stats).

    bits < 8 (e.g. INT4) emits codes in [-(2^{b-1}-1), 2^{b-1}-1] stored as
    int8 — the MXU computes at int8 rate either way on v5e (no native int4
    compute; jnp.int4 currently fails to compile on this backend), so
    sub-8-bit buys model-memory footprint via packing, not extra FLOPs."""
    if channelwise:
        from alignq_tpu.quant.cdf import channel_stats

        mean, std = channel_stats(w)
    else:
        mean, std = tensor_stats(w)
    c = 2.0 * gaussian_cdf(w, mean, std) - 1.0
    g = float(grid_max(bits))
    return jnp.clip(jnp.round(c * g), -g, g).astype(jnp.int8)


def fold_conv_bn(
    kernel: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    bn_mean: jax.Array,
    bn_var: jax.Array,
    act_scale: float,
    eps: float = 1e-5,
    bits: int = 8,
) -> QConvInt8:
    """Freeze one conv+bn pair into (integer kernel, per-channel scale/bias)."""
    k_int8 = quantize_weight_int8(kernel, bits)
    inv = bn_scale / jnp.sqrt(bn_var + eps)
    scale = act_scale * (1.0 / grid_max(bits)) * inv
    bias = bn_bias - bn_mean * inv
    return QConvInt8(k_int8, scale.astype(jnp.float32), bias.astype(jnp.float32))


# ---------------- INT4 on-wire packing ----------------
# Two 4-bit two's-complement codes per int8 byte (even index -> low nibble).
# v5e has no native int4 compute (and jnp.int4 fails to compile on this
# backend), so sub-8-bit codes compute at int8 rate either way; packing buys
# the 2x weight footprint in HBM and on disk. The unpack is a few VPU ops
# fused ahead of the conv; weights stay packed in HBM under jit.


def pack_int4(codes: jax.Array) -> jax.Array:
    """Pack int8-stored 4-bit codes pairwise along the LAST axis (must be
    even — conv Cout is even for every supported model). Inverse of
    unpack_int4."""
    if codes.shape[-1] % 2:
        raise ValueError(f"last axis must be even, got {codes.shape}")
    c = codes.astype(jnp.int32)
    lo = c[..., 0::2] & 0xF
    hi = c[..., 1::2] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Unpack uint8 bytes to int8 codes (sign-extended nibbles),
    doubling the last axis."""
    p = packed.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], -1)
    return out.astype(jnp.int8)


def _is_int4_kernel(leaf) -> bool:
    return getattr(leaf, "dtype", None) == jnp.int8 and getattr(leaf, "ndim", 0) == 4


def pack_qparams_int4(qparams):
    """Pack every 4-D int8 kernel of a converted qparams pytree (any
    infer_* family). Use with weight_bits=4 conversions: codes must fit a
    nibble ([-7, 7]); int8-range codes would be corrupted."""
    def f(leaf):
        if _is_int4_kernel(leaf):
            return pack_int4(leaf)
        return leaf

    return jax.tree.map(f, qparams)


def unpack_qparams_int4(qparams_packed):
    def f(leaf):
        if getattr(leaf, "dtype", None) == jnp.uint8 and getattr(leaf, "ndim", 0) == 4:
            return unpack_int4(leaf)
        return leaf

    return jax.tree.map(f, qparams_packed)


def packed_int4_forward(forward, qparams_packed, *args, **kwargs):
    """Run an infer_* forward on a packed-weight pytree: the unpack is part
    of the traced graph, so under jit the weights live packed in HBM and the
    nibble expansion fuses ahead of each conv."""
    return forward(unpack_qparams_int4(qparams_packed), *args, **kwargs)
