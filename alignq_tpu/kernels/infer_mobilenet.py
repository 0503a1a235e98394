"""True-INT8 MobileNet-V2 inference graph (depthwise-separable case).

Shadows the QAT forward of models/mobilenetv2.py (reference
mobilenet-v2-svhn/model/mobilenetV2.py:55-130) with the same
production-site quantization scheme as infer.py:

- every conv+bn folds to an int8 conv with per-channel scale/bias epilogue
  (depthwise via feature_group_count — int8 depthwise is XLA-native on TPU);
- act sites emit erf codes right after the fold, exactly like training;
- ReLU6 after an act site is plain ReLU on codes: act values are bounded by
  act_range=2 < 6, so the 6-clamp can never bind (mobilenetV2.py:44,59-64);
- stride-1 blocks add the act-quantized shortcut branch as INTEGER CODES on
  the shared ACT grid; block outputs (range ~[-2, 4]) requantize at S_RES
  (m=2) for the next block's 1x1 conv in exact integer arithmetic
  (kernels/infer.py _requant_codes) — bit-deterministic under any XLA
  fusion (the float formulation ties at every odd code).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import QConvInt8, fold_conv_bn
from alignq_tpu.kernels.infer import (
    S_IMG,
    _act_g,
    _erfq_codes,
    _linear_q,
    _requant_codes,
)

# expansion cfg mirror (mobilenetV2.py:77-83)
from alignq_tpu.models.mobilenetv2 import CFG


def _conv(x_int8, q: QConvInt8, stride=1, padding=0, groups=1):
    acc = jax.lax.conv_general_dilated(
        x_int8,
        q.kernel_int8,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q.scale + q.bias


def convert_mobilenetv2(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> Dict[str, Any]:
    act_scale = 2.0 / _act_g(act_bits)
    s_res = 4.0 / _act_g(act_bits)

    def fold_path(block, conv_name, bn_name, act_scale_in):
        blk_p = params[block] if block else params
        blk_s = batch_stats[block] if block else batch_stats
        return fold_conv_bn(
            blk_p[conv_name]["kernel"],
            blk_p[bn_name]["scale"], blk_p[bn_name]["bias"],
            blk_s[bn_name]["mean"], blk_s[bn_name]["var"],
            act_scale=act_scale_in, bits=weight_bits,
        )

    out: Dict[str, Any] = {
        "conv1": fold_path(None, "conv1", "bn1", S_IMG),
        "blocks": [],
    }
    in_scale = act_scale  # stem output: relu(codes)*act_scale
    idx = 0
    for expansion, out_planes, num_blocks, stride in CFG:
        for s in [stride] + [1] * (num_blocks - 1):
            name = f"layers_{idx}"
            # stride is structural: stride-1 blocks carry the quantized
            # shortcut branch, stride-2 blocks do not (mobilenetV2.py:46-53)
            blk = {
                "conv1": fold_path(name, "conv1", "bn1", in_scale),
                "conv2": fold_path(name, "conv2", "bn2", act_scale),
                "conv3": fold_path(name, "conv3", "bn3", act_scale),
            }
            if s == 1:
                blk["shortcut"] = fold_path(name, "shortcut_conv", "shortcut_bn", in_scale)
            out["blocks"].append(blk)
            # stride-1 blocks output residual sums (range [-2, 4]); stride-2
            # blocks output bare act values (range [-2, 2])
            in_scale = s_res if s == 1 else act_scale
            idx += 1
    out["conv2"] = fold_path(None, "conv2", "bn2", in_scale)
    out["linear"] = {
        "kernel": params["linear"]["kernel"],
        "bias": params["linear"]["bias"],
    }
    return out


def mobilenetv2_int8_forward(
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8,
    act_impl: str = "erf",
) -> jax.Array:
    """The inter-block stream is INTEGER CODES (stride-1 block outputs
    a3 + relu(sc) are grid-aligned sums, and the S_RES requant ratio K/2
    lands exactly on .5 ties at every odd K — a float stream is
    fusion-nondeterministic there, exactly the ResNet-20 case;
    kernels/infer.py _requant_codes). signed=True: a3 has no trailing relu,
    so block-output codes can be negative.

    The stream is stored as INT8: every consumer of a block's output (the
    next block's conv1+shortcut, or the head conv) applies the SAME static
    requant `_requant_codes(out_c, m, g, signed=True)` with m fixed by the
    PRODUCING block's stride (m=2 residual sum, m=1 bare act), so the
    requant is applied once at the production site and the int16 code sum
    never leaves the block — bit-identical to requant-at-consumption by
    construction (verified in tests/test_kernels.py), at half the
    inter-block HBM bytes."""
    g = _act_g(act_bits)
    act_scale = 2.0 / g

    # stem: conv1 -> bn1 -> act_q1 -> relu (mobilenetV2.py:115-118); the
    # stem's m=1 "requant" is a lossless clamp of relu codes already in
    # [0, g] — fold it into the store
    h = _conv(_linear_q(x, S_IMG), qparams["conv1"], 1, 1)
    x8 = jnp.maximum(_erfq_codes(h, act_bits, act_impl), 0)

    for blk in qparams["blocks"]:
        s = 1 if "shortcut" in blk else 2
        planes = blk["conv2"].kernel_int8.shape[-1]

        h = _conv(x8, blk["conv1"], 1, 0)
        a = _erfq_codes(h, act_bits, act_impl)
        r = jnp.maximum(a, 0)  # relu6 == relu on the bounded act grid

        h = _conv(r.astype(jnp.int8), blk["conv2"], s, 1, groups=planes)
        a = _erfq_codes(h, act_bits, act_impl)
        r = jnp.maximum(a, 0)

        h = _conv(r.astype(jnp.int8), blk["conv3"], 1, 0)
        a3_c = _erfq_codes(h, act_bits, act_impl).astype(jnp.int16)  # act_q3, no relu

        if "shortcut" in blk:
            sc_h = _conv(x8, blk["shortcut"], 1, 0)
            sc_c = jnp.maximum(_erfq_codes(sc_h, act_bits, act_impl).astype(jnp.int16), 0)
            # residual sum in [-g, 2g] -> S_RES grid (m=2), stored int8
            x8 = _requant_codes(a3_c + sc_c, 2, g, signed=True)
        else:
            # bare act codes already in [-g, g]; m=1 clamp is the identity
            x8 = _requant_codes(a3_c, 1, g, signed=True)

    h = _conv(x8, qparams["conv2"], 1, 0)
    out = jnp.maximum(_erfq_codes(h, act_bits, act_impl).astype(jnp.int16), 0)
    feat = jnp.mean(out.astype(jnp.float32), axis=(1, 2)) * act_scale
    return feat @ qparams["linear"]["kernel"] + qparams["linear"]["bias"]
