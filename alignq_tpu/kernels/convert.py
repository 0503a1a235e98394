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
