"""True-INT8 DenseNet-40 inference graph.

DenseNet is PRE-activation (bn -> act_q -> relu -> conv,
dense-cifar-10/model/densenet.py:31-41), which changes the folding story vs
ResNet: BN precedes the conv and is separated from any previous conv by a
concat, so it cannot fold into a conv epilogue. Instead BN stays as an f32
per-channel affine (running stats frozen) that XLA fuses WITH the erf
quantize into one elementwise pass; the conv epilogue then carries only
act_scale * w_scale.

Bonus of pre-activation: every conv input is exactly relu(act codes) — no
requantization step exists anywhere except the image stem. Concats operate
on f32 values and are free of quantization error.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import grid_max, quantize_weight_int8
from alignq_tpu.kernels.infer import S_IMG, _act_g, _erfq_codes, _linear_q


class BNAffine(NamedTuple):
    scale: jax.Array  # gamma / sqrt(var + eps)
    bias: jax.Array  # beta - mean * scale


class QConvPre(NamedTuple):
    kernel_int8: jax.Array
    scale: jax.Array  # scalar: act_scale * w_scale


def _bn_affine(p, s, eps=1e-5) -> BNAffine:
    inv = p["scale"] / jnp.sqrt(s["var"] + eps)
    return BNAffine(inv.astype(jnp.float32), (p["bias"] - s["mean"] * inv).astype(jnp.float32))


def convert_densenet40(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> Dict[str, Any]:
    act_scale = 2.0 / _act_g(act_bits)

    def qconv(block, name, in_scale):
        k = params[block][name]["kernel"] if block else params[name]["kernel"]
        return QConvPre(
            quantize_weight_int8(k, weight_bits),
            jnp.float32(in_scale / grid_max(weight_bits)),
        )

    out: Dict[str, Any] = {
        # stem conv1 consumes the raw image (densenet.py:141)
        "conv1": qconv(None, "conv1", S_IMG),
        "stages": [],
    }
    n = 12  # (40 - 4) // 3
    for stage in range(3):
        blocks = []
        for i in range(n):
            name = f"dense{stage+1}_{i}"
            blocks.append({
                "bn": _bn_affine(params[name]["bn1"], batch_stats[name]["bn1"]),
                "conv": qconv(name, "conv1", act_scale),
            })
        entry = {"blocks": blocks}
        if stage < 2:
            tname = f"trans{stage+1}"
            entry["trans"] = {
                "bn": _bn_affine(params[tname]["bn1"], batch_stats[tname]["bn1"]),
                "conv": qconv(tname, "conv1", act_scale),
            }
        out["stages"].append(entry)
    out["bn"] = _bn_affine(params["bn"], batch_stats["bn"])
    out["fc"] = {"kernel": params["fc"]["kernel"], "bias": params["fc"]["bias"]}
    return out


def _pre_act_conv(x, bn: BNAffine, q: QConvPre, act_bits, padding, act_impl="erf"):
    """bn -> act_q -> relu -> int8 conv (DenseBasicBlock.forward)."""
    h = x * bn.scale + bn.bias
    codes = jnp.maximum(_erfq_codes(h, act_bits, act_impl), 0)  # act_q then relu
    acc = jax.lax.conv_general_dilated(
        codes.astype(jnp.int8),
        q.kernel_int8,
        window_strides=(1, 1),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q.scale


def _stage_prealloc(out, blocks, act_bits, act_impl):
    """One dense stage on a preallocated full-width buffer (see
    densenet40_int8_forward docstring for the exactness argument)."""
    b, h, w, c = out.shape
    growth = blocks[0]["conv"].kernel_int8.shape[-1]
    c_final = c + growth * len(blocks)
    buf = jnp.zeros((b, h, w, c_final), out.dtype)
    buf = jax.lax.dynamic_update_slice(buf, out, (0, 0, 0, 0))
    for i, blk in enumerate(blocks):
        c_now = c + growth * i
        bn, q = blk["bn"], blk["conv"]
        pad_n = c_final - c_now
        scale_p = jnp.pad(bn.scale.reshape(-1), (0, pad_n))
        bias_p = jnp.pad(bn.bias.reshape(-1), (0, pad_n))
        hh = buf * scale_p + bias_p
        codes = jnp.maximum(_erfq_codes(hh, act_bits, act_impl), 0)
        k = q.kernel_int8  # (3, 3, c_now, growth)
        k_p = jnp.pad(k, ((0, 0), (0, 0), (0, pad_n), (0, 0)))
        acc = jax.lax.conv_general_dilated(
            codes.astype(jnp.int8), k_p, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        new = acc.astype(jnp.float32) * q.scale
        buf = jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, c_now))
    return buf


def densenet40_int8_forward(
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8,
    act_impl: str = "erf", prealloc: bool = True,
) -> jax.Array:
    """prealloc (DEFAULT — measured 1.40x on hardware, 70.1 -> 50.2 ms at
    batch 1024, bit-identical logits on chip; the concat formulation stays
    as the A/B reference, tools/densenet_prealloc_bench.py):
    each stage's feature map lives in ONE preallocated
    full-width buffer updated in place (lax.dynamic_update_slice) instead
    of re-concatenating the whole growing map every block (the concat
    chain copies O(n_blocks^2) bytes — DenseNet's dominant cost at batch
    scale). Every block then consumes the FULL-width buffer with its BN
    scale/bias and conv kernel zero-padded over not-yet-written channels:
    those channels hold 0, bn gives 0, erfq(0)=0 codes, and a zero kernel
    column contributes exactly 0 to the int32 accumulator — every integer
    op matches the concat formulation exactly; the f32 epilogues can
    differ by 1 ulp (different fusion context -> different FMA
    contraction; measured max logit diff 1.2e-7, zero code flips), at
    ~1.4x the conv FLOPs (padded C_in), which these 12-output-channel
    convs have to spare."""
    act_scale = 2.0 / _act_g(act_bits)
    # stem: plain quantized conv on the image (no bn before it)
    q = qparams["conv1"]
    acc = jax.lax.conv_general_dilated(
        _linear_q(x, S_IMG), q.kernel_int8, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * q.scale

    for entry in qparams["stages"]:
        if prealloc and entry["blocks"]:
            out = _stage_prealloc(out, entry["blocks"], act_bits, act_impl)
        else:
            for blk in entry["blocks"]:
                new = _pre_act_conv(out, blk["bn"], blk["conv"], act_bits, 1, act_impl)
                out = jnp.concatenate([out, new], axis=-1)  # densenet.py:39
        if "trans" in entry:
            t = entry["trans"]
            out = _pre_act_conv(out, t["bn"], t["conv"], act_bits, 0, act_impl)
            out = jax.lax.reduce_window(
                out, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0  # AvgPool2d(2) (densenet.py:61)

    bn = qparams["bn"]
    h = out * bn.scale + bn.bias
    h = jnp.maximum(
        _erfq_codes(h, act_bits, act_impl).astype(jnp.float32) * act_scale, 0.0
    )
    feat = jnp.mean(h, axis=(1, 2))
    return feat @ qparams["fc"]["kernel"] + qparams["fc"]["bias"]
