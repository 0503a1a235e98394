"""True-INT8 ResNet-20 inference graph (the bench.py headline path).

Per conv site: Pallas fused CDF-quantize of the activation to int8
(kernels/quantize.py), XLA int8 conv on the MXU with int32 accumulation,
then the folded BN (scale, bias) epilogue in f32 — residual adds and ReLUs
stay in f32 on the VPU where XLA fuses them with the epilogue.

Replaces the reference's fake-quant forward (r20/model/resnet.py:145-160) on
the inference path; topology ('ours' ordering, conv->bn->act_q->relu) and
quantization semantics match QAT so trained weights drop in via
kernels/convert.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import QConvInt8, fold_conv_bn
from alignq_tpu.kernels.quantize import cdf_quantize_int8

ACT_SCALE = 2.0 / 127.0  # act_range=2 folded over the symmetric 127 grid


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


def _quant(x: jax.Array) -> jax.Array:
    return cdf_quantize_int8(x)


def convert_resnet20(params: Dict[str, Any], batch_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every conv+bn pair of the trained PreActResNet-20 into int8 form."""
    out: Dict[str, Any] = {}

    def fold(conv_path, bn_path):
        k = params
        for p in conv_path:
            k = k[p]
        bnp, bns = params, batch_stats
        for p in bn_path:
            bnp = bnp[p]
            bns = bns[p]
        return fold_conv_bn(
            k["kernel"], bnp["scale"], bnp["bias"], bns["mean"], bns["var"],
            act_scale=ACT_SCALE,
        )

    out["conv0"] = fold(("conv0",), ("bn",))
    layers = sorted(
        (k for k in params if k.startswith("layers_")),
        key=lambda s: int(s.split("_")[1]),
    )
    out["layers"] = []
    for name in layers:
        # stride is structural: presence of the skip branch implies stride 2
        # (resnet.py:61-66) — keeping it out of the pytree leaves it static
        # under jit.
        blk = {
            "conv0": fold((name, "conv0"), (name, "bn0")),
            "conv1": fold((name, "conv1"), (name, "bn1")),
        }
        if "skip_conv" in params[name]:
            blk["skip"] = fold((name, "skip_conv"), (name, "skip_bn"))
        out["layers"].append(blk)
    out["logit"] = {
        "kernel": params["logit"]["kernel"],
        "bias": params["logit"]["bias"],
    }
    return out


def resnet20_int8_forward(qparams: Dict[str, Any], x: jax.Array) -> jax.Array:
    """INT8 forward matching the 'ours' topology (resnet.py:145-160):
    stem conv -> bn -> act_q -> relu; blocks conv->bn->act_q(->relu) with
    residual adds in f32."""
    # stem: the first conv consumes the (normalized f32) image quantized to
    # int8 on the same grid — input stats are ~N(0,1) post-normalization
    out = _int8_conv(_quant(x), qparams["conv0"], 1, 1)
    out = jax.nn.relu(out)  # act_q is realized by the NEXT conv's quantize
    for blk in qparams["layers"]:
        stride = 2 if "skip" in blk else 1
        if "skip" in blk:
            shortcut = _int8_conv(_quant(out), blk["skip"], stride, 0)
        else:
            shortcut = out
        h = _int8_conv(_quant(out), blk["conv0"], stride, 1)
        h = jax.nn.relu(h)
        h = _int8_conv(_quant(h), blk["conv1"], 1, 1)
        out = jax.nn.relu(h + shortcut)
    feat = jnp.mean(out, axis=(1, 2))
    return feat @ qparams["logit"]["kernel"] + qparams["logit"]["bias"]


def build_resnet20_int8(batch: int):
    """(fn, args) pair for bench.py: jitted int8 forward on fresh params."""
    from alignq_tpu.models import resnet20_quant

    model = resnet20_quant(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    qparams = convert_resnet20(variables["params"], variables["batch_stats"])
    fwd = jax.jit(resnet20_int8_forward)
    return fwd, (qparams, x)
