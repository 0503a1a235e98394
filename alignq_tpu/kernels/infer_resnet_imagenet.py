"""True-INT8 ImageNet-layout ResNet (18/34/50) feature extractor.

Shadows models/resnet_imagenet.py (reference dann_office/model/resnet.py:
184-418) with the production-site scheme of infer.py:

- Bottleneck: conv1(1x1)->bn->act_q->relu; conv2(3x3,s)->bn->act_q->relu;
  conv3(1x1)->bn->act_q3 (no relu); downsample conv+bn has NO act quant
  (resnet.py:349-355) so its epilogue emits plain f32; residual add + relu
  in f32.
- conv inputs after act sites reuse the codes losslessly; residual-sum
  consumers requantize at S_RES; the image stem at S_IMG; maxpool preserves
  the act grid (max of grid values is a grid value).
- Returns the pooled penultimate FEATURE (resnet.py:384-387); DANN/DSAN
  heads stay f32 (tiny matmuls).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import fold_conv_bn
from alignq_tpu.kernels.infer import S_IMG, _act_g, _erfq_codes, _linear_q


def _conv(x_int8, q, stride=1, padding=0, in_scale=None):
    """in_scale: optional runtime (dynamic) input scale multiplied into the
    epilogue — used where the input range is unbounded (residual sums with
    un-act-quantized identity branches) and a static grid would clip."""
    acc = jax.lax.conv_general_dilated(
        x_int8, q.kernel_int8, (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = q.scale if in_scale is None else q.scale * in_scale
    return acc.astype(jnp.float32) * scale + q.bias


def _dynamic_q(x):
    """Per-tensor dynamic symmetric int8: returns (codes, scale)."""
    s = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def convert_resnet_imagenet(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> Dict[str, Any]:
    """Fold a trained ResNetFeature (18/34/50 — walked structurally)."""
    act_scale = 2.0 / _act_g(act_bits)
    s_res = 4.0 / _act_g(act_bits)

    def fold(block, conv, bn, in_scale):
        p = params[block] if block else params
        s = batch_stats[block] if block else batch_stats
        return fold_conv_bn(
            p[conv]["kernel"], p[bn]["scale"], p[bn]["bias"],
            s[bn]["mean"], s[bn]["var"], act_scale=in_scale, bits=weight_bits,
        )

    out: Dict[str, Any] = {"conv1": fold(None, "conv1", "bn1", S_IMG), "layers": []}
    names = sorted(
        (k for k in params if k.startswith("layer")),
        key=lambda s: (int(s[5]), int(s.split("_")[1])),
    )
    for name in names:
        is_bottleneck = "conv3" in params[name]
        # block-input convs fold WITHOUT an input scale (1.0): the identity
        # branch is never act-quantized (resnet.py:349-355) so residual sums
        # are unbounded — the forward quantizes them dynamically per batch
        # and multiplies the runtime scale into the epilogue
        blk = {
            "conv1": fold(name, "conv1", "bn1", 1.0),
            "conv2": fold(name, "conv2", "bn2", act_scale),
        }
        if is_bottleneck:
            blk["conv3"] = fold(name, "conv3", "bn3", act_scale)
        if "downsample_conv" in params[name]:
            blk["downsample"] = fold(name, "downsample_conv", "downsample_bn", 1.0)
        out["layers"].append(blk)
    return out


def resnet_imagenet_int8_forward(
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8
) -> jax.Array:
    import flax.linen as nn

    act_scale = 2.0 / _act_g(act_bits)

    # stem: conv1 7x7 s2 -> bn -> act_q0 -> relu -> maxpool
    h = _conv(_linear_q(x, S_IMG), qparams["conv1"], 2, 3)
    out = jax.nn.relu(_erfq_codes(h, act_bits).astype(jnp.float32) * act_scale)
    out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    for blk in qparams["layers"]:
        is_bottleneck = "conv3" in blk
        # stride sits on conv2 (and downsample); structural: a downsample at
        # a stage boundary means stride 2 except the very first block
        stride = 2 if ("downsample" in blk and blk is not qparams["layers"][0]) else 1
        x8, s_in = _dynamic_q(out)
        identity = out
        if "downsample" in blk:
            identity = _conv(x8, blk["downsample"], stride, 0, s_in)  # no act quant

        if is_bottleneck:
            h = _conv(x8, blk["conv1"], 1, 0, s_in)  # 1x1; stride sits on conv2
        else:
            h = _conv(x8, blk["conv1"], stride, 1, s_in)  # BasicBlock 3x3 strided
        a = _erfq_codes(h, act_bits)
        r = jnp.maximum(a, 0)

        if is_bottleneck:
            h = _conv(r.astype(jnp.int8), blk["conv2"], stride, 1)
            a = _erfq_codes(h, act_bits)
            r = jnp.maximum(a, 0)
            h = _conv(r.astype(jnp.int8), blk["conv3"], 1, 0)
        else:
            h = _conv(r.astype(jnp.int8), blk["conv2"], 1, 1)
        a_last = _erfq_codes(h, act_bits).astype(jnp.float32) * act_scale  # no relu
        out = jax.nn.relu(a_last + identity)

    return jnp.mean(out, axis=(1, 2))


def dann_int8_forward(
    qparams: Dict[str, Any],
    heads: Dict[str, Any],
    x: jax.Array,
    act_bits: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Deploy a trained DANN: INT8 feature trunk + f32 classifier heads.

    heads: {'class_classifier': {'kernel','bias'}, 'domain_classifier': ...}
    from the trained DANN params (models/dann.py). The GRL is training-only
    (identity at inference); returns (class_logits, domain_logits)."""
    feat = resnet_imagenet_int8_forward(qparams, x, act_bits)
    cls = feat @ heads["class_classifier"]["kernel"] + heads["class_classifier"]["bias"]
    dom = feat @ heads["domain_classifier"]["kernel"] + heads["domain_classifier"]["bias"]
    return cls, dom


def convert_dann(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a trained DANN into (int8 feature qparams, f32 heads)."""
    qparams = convert_resnet_imagenet(
        params["feature"], batch_stats.get("feature", {}),
        weight_bits=weight_bits, act_bits=act_bits,
    )
    heads = {
        "class_classifier": dict(params["class_classifier"]),
        "domain_classifier": dict(params["domain_classifier"]),
    }
    return qparams, heads
