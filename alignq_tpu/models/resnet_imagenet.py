"""Quantized torchvision-layout ResNet-18/34/50 feature extractors.

Reference: /root/reference/cdf_alignment/dann_office/model/resnet.py:170-418
(and the ADMM twin /root/reference/cdf_alignment_admm/dann_office/model/resnet.py,
which attaches one ADMM site per Bottleneck on act_q3 only, :115-130).

Notes:
- forward returns the penultimate FEATURE, not logits (resnet.py:384-387);
  the fc head exists in params for torchvision checkpoint compatibility but
  is unused by the DA heads.
- conv1 is a quantized 7x7 stride-2; maxpool 3x3 stride-2 follows.
- act-quant ordering is conv -> bn -> act_q -> relu except act_q3/act_q2
  (last of block) which has no relu before the residual add.
- the reference downsample path has NO act quant (resnet.py:349-355).
- kaiming_normal fan_out init (resnet.py:329-333).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.nn.layers import BatchNorm, QConv, QuantAct

kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    stage: str = "quant"  # 'align' = FP32 CDF-only ablation (nn/layers.py)
    cdf_impl: str = "erf"

    expansion = 1

    @nn.compact
    def __call__(self, x, train=False, compute_corr=False):
        ura = not train
        kw = dict(use_bias=False, w_bit=self.w_bit, a_bit=self.a_bit,
                  method=self.method, variant=self.variant)
        act_kw = dict(a_bit=self.a_bit, act_range=self.act_range,
                      method=self.method, variant=self.variant,
                      stage=self.stage, cdf_impl=self.cdf_impl)
        identity = x
        out = QConv(self.planes, (3, 3), (self.stride, self.stride), 1, name="conv1", **kw)(x)
        out = BatchNorm(ura, name="bn1")(out)
        out = QuantAct(name="act_q1", **act_kw)(out)
        out = jax.nn.relu(out)
        out = QConv(self.planes, (3, 3), (1, 1), 1, name="conv2", **kw)(out)
        out = BatchNorm(ura, name="bn2")(out)
        # ADMM site on the final act (admm twin attaches here)
        out = QuantAct(name="act_q2", admm=self.admm, **act_kw)(out, compute_corr)
        if self.has_downsample:
            identity = QConv(
                self.planes * self.expansion, (1, 1),
                (self.stride, self.stride), 0, name="downsample_conv", **kw,
            )(x)
            identity = BatchNorm(ura, name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    stage: str = "quant"
    cdf_impl: str = "erf"

    expansion = 4

    @nn.compact
    def __call__(self, x, train=False, compute_corr=False):
        ura = not train
        kw = dict(use_bias=False, w_bit=self.w_bit, a_bit=self.a_bit,
                  method=self.method, variant=self.variant)
        act_kw = dict(a_bit=self.a_bit, act_range=self.act_range,
                      method=self.method, variant=self.variant,
                      stage=self.stage, cdf_impl=self.cdf_impl)
        identity = x
        width = self.planes
        out = QConv(width, (1, 1), (1, 1), 0, name="conv1", **kw)(x)
        out = BatchNorm(ura, name="bn1")(out)
        out = QuantAct(name="act_q1", **act_kw)(out)
        out = jax.nn.relu(out)
        out = QConv(width, (3, 3), (self.stride, self.stride), 1, name="conv2", **kw)(out)
        out = BatchNorm(ura, name="bn2")(out)
        out = QuantAct(name="act_q2", **act_kw)(out)
        out = jax.nn.relu(out)
        out = QConv(width * self.expansion, (1, 1), (1, 1), 0, name="conv3", **kw)(out)
        out = BatchNorm(ura, name="bn3")(out)
        # ADMM per Bottleneck attached to act_q3 only
        # (cdf_alignment_admm/dann_office/model/resnet.py:115-130)
        out = QuantAct(name="act_q3", admm=self.admm, **act_kw)(out, compute_corr)
        if self.has_downsample:
            identity = QConv(
                self.planes * self.expansion, (1, 1),
                (self.stride, self.stride), 0, name="downsample_conv", **kw,
            )(x)
            identity = BatchNorm(ura, name="downsample_bn")(identity)
        return jax.nn.relu(out + identity)


class ResNetFeature(nn.Module):
    """ImageNet ResNet trunk; returns the pooled penultimate feature."""

    block: type = Bottleneck
    layers: Sequence[int] = (3, 4, 6, 3)
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    stage: str = "quant"
    cdf_impl: str = "erf"

    @nn.compact
    def __call__(self, x, train: bool = False, compute_corr: bool = False):
        ura = not train
        out = QConv(
            64, (7, 7), (2, 2), 3, use_bias=False, w_bit=self.w_bit,
            a_bit=self.a_bit, method=self.method, variant=self.variant,
            name="conv1",
        )(x)
        out = BatchNorm(ura, name="bn1")(out)
        out = QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, stage=self.stage, cdf_impl=self.cdf_impl,
            name="act_q0",
        )(out)
        out = jax.nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        kw = dict(w_bit=self.w_bit, a_bit=self.a_bit, method=self.method,
                  variant=self.variant, act_range=self.act_range,
                  admm=self.admm, stage=self.stage, cdf_impl=self.cdf_impl)
        for stage, (planes, blocks) in enumerate(zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                s = stride if b == 0 else 1
                has_ds = b == 0 and (s != 1 or inplanes != planes * self.block.expansion)
                out = self.block(
                    planes=planes, stride=s, has_downsample=has_ds,
                    name=f"layer{stage+1}_{b}", **kw,
                )(out, train, compute_corr)
                inplanes = planes * self.block.expansion
        feature = jnp.mean(out, axis=(1, 2))  # AdaptiveAvgPool2d((1,1)) + flatten
        return feature


def resnet18_quant(bitW=8, abitW=8, method="ours", admm=False, **kw) -> ResNetFeature:
    return ResNetFeature(block=BasicBlock, layers=(2, 2, 2, 2), w_bit=bitW,
                         a_bit=abitW, method=method, admm=admm, **kw)


def resnet34_quant(bitW=8, abitW=8, method="ours", admm=False, **kw) -> ResNetFeature:
    return ResNetFeature(block=BasicBlock, layers=(3, 4, 6, 3), w_bit=bitW,
                         a_bit=abitW, method=method, admm=admm, **kw)


def resnet50_quant(bitW=8, abitW=8, method="ours", admm=False, **kw) -> ResNetFeature:
    return ResNetFeature(block=Bottleneck, layers=(3, 4, 6, 3), w_bit=bitW,
                         a_bit=abitW, method=method, admm=admm, **kw)
