"""True-INT8 ImageNet-layout ResNet (18/34/50) feature extractor.

Shadows models/resnet_imagenet.py (reference dann_office/model/resnet.py:
184-418) with the production-site scheme of infer.py:

- Bottleneck: conv1(1x1)->bn->act_q->relu; conv2(3x3,s)->bn->act_q->relu;
  conv3(1x1)->bn->act_q3 (no relu); downsample conv+bn has NO act quant
  (resnet.py:349-355) so its epilogue emits plain f32; residual add + relu
  in f32.
- conv inputs after act sites reuse the codes losslessly; residual-sum
  consumers requantize DYNAMICALLY (per-tensor max scale — the identity
  branch is never act-quantized so the range is unbounded): in exact
  integer arithmetic while the stream is grid-aligned (_dynamic_q_codes),
  in f32 once a downsample epilogue makes it generic (_dynamic_q); the
  image stem quantizes at S_IMG; maxpool runs on the integer codes (max of
  grid values is the grid value of the max code).
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
    """Per-tensor dynamic symmetric int8: returns (codes, scale).

    For GENERIC f32 values only (rounding ties have measure zero there).
    Grid-aligned code streams must use _dynamic_q_codes: their ratio
    127*K/K_max lands exactly on .5 ties (e.g. K_max=2g saturated residual
    sums -> every odd K), where a float round is fusion-nondeterministic
    (kernels/infer.py _requant_codes)."""
    s = jnp.maximum(jnp.max(jnp.abs(x)) / 127.0, 1e-12)
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s


def _exact_floor_div(num, den):
    """Exact integer floor(num/den) for a TRACED denominator without the
    per-element software integer division XLA emits for `//` by a
    non-constant (measured 25x on a whole graph): approximate in f32 (both
    operands < 2^24, so they are exactly representable), then correct the
    at-most-1-ulp quotient error with one exact integer multiply-compare —
    the result is exact regardless of how XLA lowers the f32 divide."""
    q = jnp.floor(
        num.astype(jnp.float32) / den.astype(jnp.float32)
    ).astype(jnp.int32)
    r = num - q * den  # exact in int32
    return q + (r >= den).astype(jnp.int32) - (r < 0).astype(jnp.int32)


def _dynamic_q_codes(k, act_scale):
    """_dynamic_q of a grid-aligned stream (value = K*act_scale, K int32) in
    EXACT integer arithmetic: codes = round-half-up(127*K/K_max), scale =
    K_max*act_scale/127 — bit-deterministic under any XLA fusion."""
    k = k.astype(jnp.int32)  # headroom: 254*K overflows the int16 stream dtype
    kmax = jnp.maximum(jnp.max(jnp.abs(k)), 1)
    c = _exact_floor_div(2 * 127 * k + kmax, 2 * kmax)
    c = jnp.clip(c, -127, 127).astype(jnp.int8)
    return c, kmax.astype(jnp.float32) * (act_scale / 127.0)


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
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8,
    act_impl: str = "erf",
) -> jax.Array:
    """The residual stream starts as INT16 CODES (act grid) and stays
    integer until the first downsample mixes in a non-act-quantized f32
    epilogue (structural, so the branching is trace-time): layer1 of
    ResNet-18/34 and the first block input of every net are grid-aligned,
    where a float dynamic requant is fusion-nondeterministic (ties at
    127*K/K_max; see _dynamic_q_codes). From the first downsample onward the
    stream is generic f32 (ties measure zero) and the float path is safe."""
    act_scale = 2.0 / _act_g(act_bits)

    # stem: conv1 7x7 s2 -> bn -> act_q0 -> relu -> maxpool (on codes: max
    # of grid values == grid value of max code)
    h = _conv(_linear_q(x, S_IMG), qparams["conv1"], 2, 3)
    out_c = jnp.maximum(_erfq_codes(h, act_bits, act_impl).astype(jnp.int16), 0)
    out_c = jax.lax.reduce_window(
        out_c, jnp.int16(jnp.iinfo(jnp.int16).min), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    out_f = None  # f32 stream once a downsample epilogue enters the residual

    for blk in qparams["layers"]:
        is_bottleneck = "conv3" in blk
        # stride sits on conv2 (and downsample); structural: a downsample at
        # a stage boundary means stride 2 except the very first block
        stride = 2 if ("downsample" in blk and blk is not qparams["layers"][0]) else 1
        if out_c is not None:
            x8, s_in = _dynamic_q_codes(out_c, act_scale)
        else:
            x8, s_in = _dynamic_q(out_f)

        if "downsample" in blk:
            identity_f = _conv(x8, blk["downsample"], stride, 0, s_in)  # no act quant
            identity_c = None
        else:
            identity_c, identity_f = out_c, out_f

        if is_bottleneck:
            h = _conv(x8, blk["conv1"], 1, 0, s_in)  # 1x1; stride sits on conv2
        else:
            h = _conv(x8, blk["conv1"], stride, 1, s_in)  # BasicBlock 3x3 strided
        a = _erfq_codes(h, act_bits, act_impl)
        r = jnp.maximum(a, 0)

        if is_bottleneck:
            h = _conv(r.astype(jnp.int8), blk["conv2"], stride, 1)
            a = _erfq_codes(h, act_bits, act_impl)
            r = jnp.maximum(a, 0)
            h = _conv(r.astype(jnp.int8), blk["conv3"], 1, 0)
        else:
            h = _conv(r.astype(jnp.int8), blk["conv2"], 1, 1)
        a_last_c = _erfq_codes(h, act_bits, act_impl).astype(jnp.int16)  # no relu
        if identity_c is not None:
            out_c, out_f = jnp.maximum(a_last_c + identity_c, 0), None
        else:
            out_f = jax.nn.relu(
                a_last_c.astype(jnp.float32) * act_scale + identity_f
            )
            out_c = None

    if out_c is not None:
        return jnp.mean(out_c.astype(jnp.float32), axis=(1, 2)) * act_scale
    return jnp.mean(out_f, axis=(1, 2))


def dann_int8_forward(
    qparams: Dict[str, Any],
    heads: Dict[str, Any],
    x: jax.Array,
    act_bits: int = 8,
    act_impl: str = "erf",
) -> tuple[jax.Array, jax.Array]:
    """Deploy a trained DANN: INT8 feature trunk + f32 classifier heads.

    heads: {'class_classifier': {'kernel','bias'}, 'domain_classifier': ...}
    from the trained DANN params (models/dann.py). The GRL is training-only
    (identity at inference); returns (class_logits, domain_logits)."""
    feat = resnet_imagenet_int8_forward(qparams, x, act_bits, act_impl)
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


def dsan_int8_forward(
    qparams: Dict[str, Any],
    heads: Dict[str, Any],
    x: jax.Array,
    act_bits: int = 8,
    act_impl: str = "erf",
) -> jax.Array:
    """Deploy a trained DSAN (dsan_office/model/resnet.py:333-361): INT8
    feature trunk + f32 bottleneck (if trained with one) + cls head. The
    LMMD machinery is training-only; inference is just source-path
    classification. Returns class logits."""
    feat = resnet_imagenet_int8_forward(qparams, x, act_bits, act_impl)
    if "bottle" in heads:
        feat = feat @ heads["bottle"]["kernel"] + heads["bottle"]["bias"]
    return feat @ heads["cls_fc"]["kernel"] + heads["cls_fc"]["bias"]


def convert_dsan(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a trained DSAN into (int8 feature qparams, f32 heads)."""
    qparams = convert_resnet_imagenet(
        params["feature_layers"], batch_stats.get("feature_layers", {}),
        weight_bits=weight_bits, act_bits=act_bits,
    )
    heads = {"cls_fc": dict(params["cls_fc"])}
    if "bottle" in params:
        heads["bottle"] = dict(params["bottle"])
    return qparams, heads


def mdd_int8_forward(
    qparams: Dict[str, Any],
    heads: Dict[str, Any],
    x: jax.Array,
    act_bits: int = 8,
    act_impl: str = "erf",
) -> jax.Array:
    """Deploy a trained MDD net (models/mdd.py MDDNet; reference
    dann_office/model/resnet.py:366-410, dead code there): INT8 feature
    trunk + f32 bottleneck (fc -> bn -> relu) + classifier MLP
    (fc0 -> relu -> fc1). The adversarial classifier and GRL are
    training-only (the margin objective needs them; prediction uses
    `outputs` — fit_mdd's eval path); dropout is identity at inference.
    Returns class logits."""
    feat = resnet_imagenet_int8_forward(qparams, x, act_bits, act_impl)
    if "bottleneck_fc" in heads:
        bfc = heads["bottleneck_fc"]
        feat = feat @ bfc["kernel"] + bfc["bias"]
        bn = heads["bottleneck_bn"]
        feat = (feat - bn["mean"]) * jax.lax.rsqrt(bn["var"] + 1e-5)
        feat = feat * bn["scale"] + bn["bias"]
        feat = jax.nn.relu(feat)
    cls = heads["classifier"]
    h = jax.nn.relu(feat @ cls["fc0"]["kernel"] + cls["fc0"]["bias"])
    return h @ cls["fc1"]["kernel"] + cls["fc1"]["bias"]


def convert_mdd(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> tuple[Dict[str, Any], Dict[str, Any]]:
    """Split a trained MDDNet into (int8 trunk qparams, f32 heads).

    heads carries the bottleneck fc + folded-in BN statistics (when the net
    was built with use_bottleneck) and the prediction classifier MLP; the
    adversarial head is dropped (training-only, mdd_int8_forward docstring).
    """
    qparams = convert_resnet_imagenet(
        params["base_network"], batch_stats.get("base_network", {}),
        weight_bits=weight_bits, act_bits=act_bits,
    )
    heads: Dict[str, Any] = {"classifier": {
        "fc0": dict(params["classifier"]["fc0"]),
        "fc1": dict(params["classifier"]["fc1"]),
    }}
    if "bottleneck_fc" in params:
        heads["bottleneck_fc"] = dict(params["bottleneck_fc"])
        heads["bottleneck_bn"] = {
            "scale": params["bottleneck_bn"]["scale"],
            "bias": params["bottleneck_bn"]["bias"],
            "mean": batch_stats["bottleneck_bn"]["mean"],
            "var": batch_stats["bottleneck_bn"]["var"],
        }
    return qparams, heads
