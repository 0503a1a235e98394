"""True-INT8 DenseNet-40 inference graph.

DenseNet is PRE-activation (bn -> act_q -> relu -> conv,
dense-cifar-10/model/densenet.py:31-41), which changes the folding story vs
ResNet: BN precedes the conv and is separated from any previous conv by a
concat, so it cannot fold into a conv epilogue. Instead BN stays as an f32
per-channel affine (running stats frozen) that XLA fuses WITH the erf
quantize into one elementwise pass; the conv epilogue then carries only
act_scale * w_scale.

Bonus of pre-activation: every conv input is exactly relu(act codes) — in
the default f32-buffer mode no requantization step exists anywhere except
the image stem, and concats operate on f32 values free of quantization
error.

stage_int8 mode (VERDICT r3 item 1): the stage buffer itself is stored as
INT8 CODES with calibrated per-channel scales (nn/layers.py StageRequant
sites trained into the QAT graph), cutting the dominant HBM cost — each of
the 12 blocks per stage re-reads the full-width buffer for its own bn+act
pass (stage 1 at batch 1024: 705 MB -> 176 MB per read). Each consumer's BN
is a per-channel affine, so it folds over the shared code grid
(h = codes*(svec*bn.scale) + bn.bias) exactly like the f32 fold; the new
cost is one trained-through requantization per writer (stem, block,
transition). Measured by tools/export_int8.py --model densenet40
--stage_int8 (accuracy) and tools/densenet_prealloc_bench.py (throughput).
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
    stage_int8: bool = False,
) -> Dict[str, Any]:
    """stage_int8: additionally read the calibrated StageRequant amax stats
    (a DenseNet(stage_int8=True) QAT run) and emit the per-channel buffer
    scales the int8-stage-buffer forward needs: per stage one `svec`
    (c_final,) value-scale vector over the full buffer width, and per
    writer (stem / block / transition) its output-slice scale."""
    act_scale = 2.0 / _act_g(act_bits)

    def qconv(block, name, in_scale):
        k = params[block][name]["kernel"] if block else params[name]["kernel"]
        return QConvPre(
            quantize_weight_int8(k, weight_bits),
            jnp.float32(in_scale / grid_max(weight_bits)),
        )

    def req_scale(*path):
        s = batch_stats
        for p in path:
            s = s[p]
        # reciprocal multiply, bit-matching StageRequant's scale expression
        # (division differs by <=1 ulp and would shift requant boundaries)
        return jnp.maximum(s["amax"], 1e-6).astype(jnp.float32) * (1.0 / 127.0)

    out: Dict[str, Any] = {
        # stem conv1 consumes the raw image (densenet.py:141)
        "conv1": qconv(None, "conv1", S_IMG),
        "stages": [],
    }
    if stage_int8:
        seed_scale = req_scale("requant_stem")
        out["stem_scale"] = seed_scale
    # blocks per stage from the params themselves ((depth-4)//3 = 12 for
    # DenseNet-40; derived so smaller test depths convert too)
    n = sum(1 for k in params if k.startswith("dense1_"))
    for stage in range(3):
        blocks = []
        svec = [seed_scale] if stage_int8 else None
        for i in range(n):
            name = f"dense{stage+1}_{i}"
            blk = {
                "bn": _bn_affine(params[name]["bn1"], batch_stats[name]["bn1"]),
                "conv": qconv(name, "conv1", act_scale),
            }
            if stage_int8:
                blk["out_scale"] = req_scale(name, "requant")
                svec.append(blk["out_scale"])
            blocks.append(blk)
        entry = {"blocks": blocks}
        if stage_int8:
            entry["svec"] = jnp.concatenate(svec)
        if stage < 2:
            tname = f"trans{stage+1}"
            entry["trans"] = {
                "bn": _bn_affine(params[tname]["bn1"], batch_stats[tname]["bn1"]),
                "conv": qconv(tname, "conv1", act_scale),
            }
            if stage_int8:
                seed_scale = req_scale(tname, "requant")
                entry["trans"]["out_scale"] = seed_scale
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
        # STATIC prefix slice: block i's consumer only touches the c_now
        # live channels (the Python unroll makes c_now a compile-time
        # constant). The earlier zero-padded-to-c_final formulation ran the
        # bn+act epilogue AND the conv over dead channels that contribute
        # exactly 0 to the accumulator — ~1.9x the mandatory VPU elements
        # and MACs summed over a stage (sum of c_now vs n_blocks*c_final).
        # Integer-exact vs padding: dropping exact-zero contributions
        # changes no accumulator bit.
        view = jax.lax.slice_in_dim(buf, 0, c_now, axis=3)
        hh = view * bn.scale.reshape(-1) + bn.bias.reshape(-1)
        codes = jnp.maximum(_erfq_codes(hh, act_bits, act_impl), 0)
        acc = jax.lax.conv_general_dilated(
            codes.astype(jnp.int8), q.kernel_int8, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        new = acc.astype(jnp.float32) * q.scale
        buf = jax.lax.dynamic_update_slice(buf, new, (0, 0, 0, c_now))
    return buf


def _requant_write(value: jax.Array, out_scale: jax.Array) -> jax.Array:
    """value -> buffer codes: clip(round(value / s), -127, 127) int8 — the
    deployed twin of nn/layers.py StageRequant's QAT fake-quant (same
    reciprocal-multiply rounding; quant/ste.py requant_ste)."""
    c = jnp.round(value * (1.0 / out_scale))
    return jnp.clip(c, -127.0, 127.0).astype(jnp.int8)


def _stage_prealloc_int8(c8, svec, blocks, act_bits, act_impl):
    """One dense stage on a preallocated INT8 code buffer (stage_int8 mode).

    Identical structure to _stage_prealloc, but the buffer holds int8 codes
    with per-channel value scales `svec` (c_final,) instead of f32 values —
    4x less HBM traffic on the 12 full-width bn+act re-reads per stage, the
    deployment graph's dominant cost (ARCHITECTURE.md DenseNet analysis;
    VERDICT r3 item 1: each consumer's BN is a per-channel affine, so it
    folds over the shared code grid as h = codes*(svec*bn.scale) + bn.bias).
    Each block's conv epilogue requantizes its new features onto their
    calibrated slice scale (codes = round(acc * conv_scale / s_out)) and
    writes int8. Consumers read a static prefix slice of the live
    channels, as in the f32 version.
    """
    b, h, w, c = c8.shape
    growth = blocks[0]["conv"].kernel_int8.shape[-1]
    c_final = c + growth * len(blocks)
    buf = jnp.zeros((b, h, w, c_final), jnp.int8)
    buf = jax.lax.dynamic_update_slice(buf, c8, (0, 0, 0, 0))
    for i, blk in enumerate(blocks):
        c_now = c + growth * i
        bn, q = blk["bn"], blk["conv"]
        # STATIC prefix slice over the live channels (see _stage_prealloc:
        # c_now is a compile-time constant, dead channels contribute
        # exactly 0 — dropping them is integer-exact and halves the per-
        # stage dequant+bn+act VPU elements and conv MACs)
        view = jax.lax.slice_in_dim(buf, 0, c_now, axis=3)
        hh = view.astype(jnp.float32) * (
            svec[:c_now] * bn.scale.reshape(-1)
        ) + bn.bias.reshape(-1)
        codes = jnp.maximum(_erfq_codes(hh, act_bits, act_impl), 0)
        acc = jax.lax.conv_general_dilated(
            codes.astype(jnp.int8), q.kernel_int8, (1, 1), [(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        # epilogue: value = acc*q.scale; buffer code = round(value/s_out) —
        # one fused per-channel multiply+round+clip+cast
        new_c8 = _requant_write(acc.astype(jnp.float32) * q.scale, blk["out_scale"])
        buf = jax.lax.dynamic_update_slice(buf, new_c8, (0, 0, 0, c_now))
    return buf


def _pre_act_conv_int8buf(buf, svec, bn, q, act_bits, padding, act_impl):
    """bn -> act_q -> relu -> int8 conv, consuming an int8 code buffer."""
    hh = buf.astype(jnp.float32) * (svec * bn.scale.reshape(-1)) + bn.bias.reshape(-1)
    codes = jnp.maximum(_erfq_codes(hh, act_bits, act_impl), 0)
    acc = jax.lax.conv_general_dilated(
        codes.astype(jnp.int8), q.kernel_int8, (1, 1),
        [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q.scale


def densenet40_int8_forward(
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8,
    act_impl: str = "erf", prealloc: bool = True, stage_int8: bool = False,
) -> jax.Array:
    """prealloc (DEFAULT — measured 1.40x on hardware, 70.1 -> 50.2 ms at
    batch 1024, bit-identical logits on chip; the concat formulation stays
    as the A/B reference, tools/densenet_prealloc_bench.py):
    each stage's feature map lives in ONE preallocated
    full-width buffer updated in place (lax.dynamic_update_slice) instead
    of re-concatenating the whole growing map every block (the concat
    chain copies O(n_blocks^2) bytes — DenseNet's dominant cost at batch
    scale). Each block consumes a STATIC prefix slice of the buffer (its
    c_now live channels — compile-time constants under the Python
    unroll), so per-consumer bn+act VPU work and conv MACs are exactly
    the reference concat formulation's, with none of its copies. Every
    integer op matches the concat formulation exactly; the f32 epilogues
    can differ by 1 ulp (different fusion context -> different FMA
    contraction; measured max logit diff 1.2e-7, zero code flips)."""
    act_scale = 2.0 / _act_g(act_bits)
    # stem: plain quantized conv on the image (no bn before it)
    q = qparams["conv1"]
    acc = jax.lax.conv_general_dilated(
        _linear_q(x, S_IMG), q.kernel_int8, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * q.scale

    if stage_int8:
        # int8 stage buffer (stage_int8 docstrings above): requires a
        # DenseNet(stage_int8=True) QAT run and
        # convert_densenet40(stage_int8=True) scales
        assert "stem_scale" in qparams, (
            "stage_int8 forward needs convert_densenet40(stage_int8=True)"
        )
        c8 = _requant_write(out, qparams["stem_scale"])
        for entry in qparams["stages"]:
            svec = entry["svec"]
            c8 = _stage_prealloc_int8(c8, svec, entry["blocks"], act_bits, act_impl)
            if "trans" in entry:
                t = entry["trans"]
                v = _pre_act_conv_int8buf(
                    c8, svec, t["bn"], t["conv"], act_bits, 0, act_impl
                )
                v = jax.lax.reduce_window(
                    v, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                ) / 4.0
                c8 = _requant_write(v, t["out_scale"])
        bn = qparams["bn"]
        svec = qparams["stages"][-1]["svec"]
        h = c8.astype(jnp.float32) * (svec * bn.scale.reshape(-1)) + bn.bias.reshape(-1)
        h = jnp.maximum(
            _erfq_codes(h, act_bits, act_impl).astype(jnp.float32) * act_scale, 0.0
        )
        feat = jnp.mean(h, axis=(1, 2))
        return feat @ qparams["fc"]["kernel"] + qparams["fc"]["bias"]

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
