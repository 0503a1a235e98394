"""True-INT8 ResNet-20 inference graph (the bench.py headline path).

Faithfully shadows the QAT ('ours') forward (resnet.py:78-98, 145-160):

    conv -> bn -> act_q -> (relu) -> ... residual add -> relu

- act_q sites run at PRODUCTION (right after the folded conv+bn), exactly
  like training: codes = round(clip(erf(h/sqrt2), -1, 1) * 127) — the value
  is ACT_SCALE*codes, the canonical-int8 form of the reference's
  fake-quant grid (SURVEY.md section 2.4.6).
- relu / residual adds stay in f32 — identical to training; all inter-site
  values are exact multiples of ACT_SCALE.
- conv INPUTS are int8:
  * conv1 consumes relu(act-quantized codes) — bit-exact re-use of the
    codes, no requantization error;
  * block conv0 / skip consume residual sums — one linear requantization at
    the exact per-block bound (residual_bounds(); identity shortcuts grow
    the sum by +act_range per block, so the bound is 4/6/8 within each
    stage). The requant error (<= scale/2) is absent in plain fake-quant
    training; the deploy-exact QAT mode (models/resnet_cifar.py
    PreActResNet.deploy_exact) trains with these exact sites, closing the
    train!=deploy gap;
  * the stem consumes normalized images at a static calibration scale
    S_IMG.
- BN folds into the conv epilogue per-channel scale/bias (convert.py).

An earlier formulation quantized with erf at conv CONSUMPTION instead of
production; it agreed at random init but collapsed on trained nets (erf of
a residual sum != sum of erf's) — tools/export_int8.py measures the
deployment delta and guards against that class of bug.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import QConvInt8, fold_conv_bn

_SQRT2 = math.sqrt(2.0)

# 8-bit defaults; the general W{b}A{b} grids come from convert.grid_max
ACT_SCALE = 2.0 / 127.0  # act_range=2 over the symmetric 127 grid
S_RES = 4.0 / 127.0  # legacy fixed residual scale (kept for API compat; the
# graph now uses the exact per-block bounds from residual_bounds() — a fixed
# [0,4] range CLIPS: identity shortcuts grow the residual sum by +act_range
# per block within a stage, so stage-final sums reach 8 (measured 7.86)
S_IMG = 3.0 / 127.0  # normalized-image scale (CIFAR norm ~ [-2.5, 2.7])
ACT_RANGE = 2.0


def residual_bounds(has_skip, act_range: float = ACT_RANGE):
    """Exact per-block input-value bounds for the requantization sites.

    Block k's conv0/skip consume block k-1's output `out = relu(a1 + sc)`
    with a1 in [-act_range, act_range]. The shortcut is act-quantized on
    stride blocks (|sc| <= act_range) but is the raw previous output on
    identity blocks, so the bound grows by +act_range per identity block and
    resets at each stride block:

        stem -> act_range; identity blk -> in + act_range; stride blk -> 2*act_range

    For ResNet-20 (3 blocks/stage) that is in-bounds [2,4,6, 8,4,6, 8,4,6] —
    tight against measured maxima (3.95..7.86). Returns one bound per block.
    """
    bounds = []
    bound = act_range  # stem relu output
    for skip in has_skip:
        bounds.append(bound)
        sc = act_range if skip else bound
        bound = act_range + sc
    return bounds


def _act_g(act_bits: int) -> float:
    from alignq_tpu.kernels.convert import grid_max

    return float(grid_max(act_bits))


def _erfq_codes(h: jax.Array, act_bits: int = 8) -> jax.Array:
    """Act-site quantization codes: round(erf(h/sqrt2) * g) in int8 storage
    (g = 127 for A8, 7 for A4).

    Elementwise — XLA fuses it into the preceding conv's epilogue."""
    g = _act_g(act_bits)
    c = jax.lax.erf(h / _SQRT2)
    return jnp.clip(jnp.round(c * g), -g, g).astype(jnp.int8)


def _linear_q(x: jax.Array, scale: float) -> jax.Array:
    # reciprocal multiply, not division: bit-matches the deploy-exact QAT
    # requant (quant/ste.py requant_ste) so train and deploy round the same
    # codes everywhere
    return jnp.clip(jnp.round(x * (1.0 / scale)), -127.0, 127.0).astype(jnp.int8)


def _int8_conv(x_int8: jax.Array, q: QConvInt8, stride: int = 1, padding: int = 1):
    acc = jax.lax.conv_general_dilated(
        x_int8,
        q.kernel_int8,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q.scale + q.bias


def convert_preact_resnet(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> Dict[str, Any]:
    """Fold every conv+bn pair of a trained PreActResNet (20 OR 56 — the
    converter walks `layers_*` structurally) into integer form
    (W{weight_bits}A{act_bits}; codes stored int8).

    Each conv's epilogue scale folds ITS OWN input scale: stem S_IMG, block
    conv0/skip the exact per-block residual bound, conv1 the act grid
    scale."""
    out: Dict[str, Any] = {}
    g = _act_g(act_bits)

    def fold(conv_path, bn_path, act_scale):
        k = params
        for p in conv_path:
            k = k[p]
        bnp, bns = params, batch_stats
        for p in bn_path:
            bnp = bnp[p]
            bns = bns[p]
        return fold_conv_bn(
            k["kernel"], bnp["scale"], bnp["bias"], bns["mean"], bns["var"],
            act_scale=act_scale, bits=weight_bits,
        )

    out["conv0"] = fold(("conv0",), ("bn",), S_IMG)
    layers = sorted(
        (k for k in params if k.startswith("layers_")),
        key=lambda s: int(s.split("_")[1]),
    )
    # conv0/skip consume the previous block's residual output; use the exact
    # per-block bound (residual_bounds) so no requantization clips. Block 0
    # consumes the stem (exact multiples of the act grid -> lossless).
    bounds = residual_bounds(["skip_conv" in params[n] for n in layers])
    out["layers"] = []
    for name, bound in zip(layers, bounds):
        in_scale = bound / g
        blk = {
            "conv0": fold((name, "conv0"), (name, "bn0"), in_scale),
            "conv1": fold((name, "conv1"), (name, "bn1"), ACT_RANGE / g),
            "in_scale": in_scale,
        }
        if "skip_conv" in params[name]:
            blk["skip"] = fold((name, "skip_conv"), (name, "skip_bn"), in_scale)
        out["layers"].append(blk)
    out["logit"] = {
        "kernel": params["logit"]["kernel"],
        "bias": params["logit"]["bias"],
    }
    return out


def resnet20_int8_forward(
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8
) -> jax.Array:
    """INT forward shadowing the 'ours' QAT graph value-for-value.

    act_bits is static; pass the same value used in convert_resnet20."""
    act_scale = ACT_RANGE / _act_g(act_bits)
    # stem: conv0 -> bn -> act_q0 -> relu (resnet.py:147-151)
    h = _int8_conv(_linear_q(x, S_IMG), qparams["conv0"], 1, 1)
    codes = _erfq_codes(h, act_bits)
    out = jax.nn.relu(codes.astype(jnp.float32) * act_scale)

    for blk in qparams["layers"]:
        stride = 2 if "skip" in blk else 1
        # block 0: values are exact multiples of act_scale -> lossless;
        # later blocks: one exact-bound requantization of the residual sum
        # (per-block in_scale from residual_bounds, folded in convert)
        x8 = _linear_q(out, blk["in_scale"])
        if "skip" in blk:
            # shortcut = act_skip_q(skip_bn(skip_conv(x))) — no relu
            sc_h = _int8_conv(x8, blk["skip"], stride, 0)
            shortcut = _erfq_codes(sc_h, act_bits).astype(jnp.float32) * act_scale
        else:
            shortcut = out

        h0 = _int8_conv(x8, blk["conv0"], stride, 1)
        a0 = _erfq_codes(h0, act_bits)  # act_q0
        r0 = jnp.maximum(a0, 0)  # relu on codes == relu on values (sign-preserving grid)
        h1 = _int8_conv(r0.astype(jnp.int8), blk["conv1"], 1, 1)
        a1 = _erfq_codes(h1, act_bits).astype(jnp.float32) * act_scale  # act_q1
        out = jax.nn.relu(a1 + shortcut)

    feat = jnp.mean(out, axis=(1, 2))
    return feat @ qparams["logit"]["kernel"] + qparams["logit"]["bias"]


# back-compat alias; works for any PreActResNet depth
convert_resnet20 = convert_preact_resnet


def build_resnet20_int8(batch: int):
    """(fn, args) pair for bench.py: jitted int8 forward on fresh params."""
    from alignq_tpu.models import resnet20_quant

    model = resnet20_quant(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    qparams = convert_resnet20(variables["params"], variables["batch_stats"])
    fwd = jax.jit(resnet20_int8_forward)
    return fwd, (qparams, x)
