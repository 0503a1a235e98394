"""PreAct ResNet-20/56 for CIFAR, quantized, with all three method-family
topologies and the optional ADMM correlation sites.

Reference models:
- 'ours' ordering (conv -> bn -> act_q -> relu), plain:
  /root/reference/cdf_alignment/resnet-20-cifar-10/model/resnet.py:33-138
- 'ours' + ADMM (canonical):
  /root/reference/cdf_alignment_admm/resnet-56-cifar-10/model/resnet.py:36-167
- 'after' ordering (conv -> bn -> relu -> act_q), for uniform/dorefa/llsq:
  /root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/resnet_after.py:33-131
- 'none' ordering (act quant inside conv), for apot/lsq:
  /root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/resnet_none.py:24-109
- 'ours' topology + uniform quant + ADMM (ablation):
  /root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/resnet_ours_uniform_admm.py

Design notes (TPU-first):
- NHWC activations; convs map straight onto XLA TPU convolutions (MXU).
- ADMM D matrices are sowed into the 'admm_d' collection; trans-loss is
  assembled in the train step from the duals in the train state, keeping
  eval pure (reference computes it inline and threads a running scalar,
  resnet.py:78-98).
- `block_bits` supports per-block mixed precision (resnet.py:124-134).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.nn.layers import BatchNorm, QConv, QDense, QuantAct

# method -> topology family (reference main.py:50-58 arch dispatch)
ORDERING = {
    "ours": "ours",
    "uniform_admm": "ours",  # resnet_ours_uniform_admm.py keeps 'ours' topology
    "uniform": "after",
    "dorefa": "after",
    "llsq": "after",
    "bwn": "after",
    "bwnf": "after",
    "apot": "none",
    "lsq": "none",
    "fp": "none",
}


class PreActBlock(nn.Module):
    """PreActBlock_conv_Q in all three orderings."""

    out_planes: int
    stride: int = 1
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    channelwise: bool = False
    cdf_impl: str = "erf"  # act-site CDF: 'erf' | 'poly' (quant/cdf.py)
    # corr standardization eps (nn/layers.py QuantAct.corr_eps): 1e-5 = the
    # guarded office form (default); 0.0 = the raw-std r20/r56 reference form
    # (quantization.py:134-137) — used by tools/reference_parity.py
    corr_eps: float = 1e-5
    mxu_dtype: jnp.dtype | None = None
    # deploy-exact requantization of this block's input (QAT->deploy gap
    # closure): fake-quantize the conv0/skip input on the grid the INT graph
    # uses — m * act_scale, m from kernels/infer.py residual_multipliers —
    # with the same exact integer rounding (quant/ste.py requant_grid_ste).
    # The identity shortcut stays UN-requantized, exactly as the INT graph
    # adds the full-resolution residual codes. None = off.
    requant_m: int | None = None
    requant_g: int = 127

    def _conv(self, features, kernel_size, stride, padding, name):
        return QConv(
            features=features,
            kernel_size=kernel_size,
            strides=(stride, stride),
            padding=padding,
            use_bias=False,
            w_bit=self.w_bit,
            a_bit=self.a_bit,
            method=self.method,
            variant=self.variant,
            channelwise=self.channelwise,
            mxu_dtype=self.mxu_dtype,
            name=name,
        )

    def _act(self, name):
        return QuantAct(
            a_bit=self.a_bit,
            act_range=self.act_range,
            method=self.method,
            variant=self.variant,
            admm=self.admm,
            cdf_impl=self.cdf_impl,
            corr_eps=self.corr_eps,
            name=name,
        )

    @nn.compact
    def __call__(self, x, train: bool = False, compute_corr: bool = False):
        ordering = ORDERING[self.method]
        ura = not train

        xq = x
        if self.requant_m is not None:
            from alignq_tpu.quant.ste import requant_grid_ste

            xq = requant_grid_ste(
                x, self.act_range / self.requant_g, self.requant_m, self.requant_g
            )

        conv0 = self._conv(self.out_planes, (3, 3), self.stride, 1, "conv0")
        conv1 = self._conv(self.out_planes, (3, 3), 1, 1, "conv1")

        if self.stride != 1:
            skip = self._conv(self.out_planes, (1, 1), self.stride, 0, "skip_conv")
            shortcut = skip(xq)
            shortcut = BatchNorm(ura, name="skip_bn")(shortcut)
            if ordering in ("ours", "after"):
                shortcut = self._act("act_skip_q")(shortcut, compute_corr)
        else:
            # identity shortcut bypasses the requant — the INT graph adds the
            # full-resolution residual codes (kernels/infer.py sc_c = out_c)
            shortcut = x

        out = conv0(xq)
        out = BatchNorm(ura, name="bn0")(out)
        if ordering == "ours":
            # conv -> bn -> act_q -> relu (resnet.py:87-90)
            out = self._act("act_q0")(out, compute_corr)
            out = jax.nn.relu(out)
        elif ordering == "after":
            # conv -> bn -> relu -> act_q (resnet_after.py:71-73)
            out = self._act("act_q0")(jax.nn.relu(out))
        else:  # 'none': act quant lives inside the conv (resnet_none.py:54-56)
            out = jax.nn.relu(out)

        out = conv1(out)
        out = BatchNorm(ura, name="bn1")(out)
        if ordering == "ours":
            out = self._act("act_q1")(out, compute_corr)
            out = out + shortcut
            out = jax.nn.relu(out)
        elif ordering == "after":
            out = out + shortcut
            out = self._act("act_q1")(jax.nn.relu(out))
        else:
            out = out + shortcut
            out = jax.nn.relu(out)
        return out


class PreActResNet(nn.Module):
    """PreActResNet (reference resnet.py:101-160)."""

    num_units: Sequence[int] = (3, 3, 3)
    num_classes: int = 10
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    channelwise: bool = False
    cdf_impl: str = "erf"  # act-site CDF: 'erf' | 'poly' (quant/cdf.py)
    # corr standardization eps (see PreActBlock.corr_eps)
    corr_eps: float = 1e-5
    block_bits: Sequence[int] | None = None
    mxu_dtype: jnp.dtype | None = None
    # Deploy-exact QAT (VERDICT.md round-1 item 3): fake-quantize at the
    # stem-input and residual requant sites exactly as the INT graph does at
    # inference (kernels/infer.py S_IMG + residual_bounds), so train ==
    # deploy. Use with variant='int8' (the deployable grid); the requant grid
    # is the symmetric 2^(a_bit-1)-1 deploy grid, not the reference's
    # 2^k - 1 fake-quant grid.
    deploy_exact: bool = False
    # int8 residual stream (requires deploy_exact): requantize the FULL
    # inter-block stream — identity shortcut included — at each block edge
    # onto the next block's m*act_scale grid, instead of carrying the
    # full-resolution code sum and requantizing only the conv input. This
    # is the semantics of kernels/infer.py resnet20_int8_forward(
    # stream='int8'), whose stored stream is int8 codes (half the HBM bytes
    # of the exact int16 stream). Each block edge loses log2(m) <= 2 bits
    # of stream resolution; training with it (this flag) is what makes the
    # deployment exact.
    stream_int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, compute_corr: bool = False):
        ordering = ORDERING[self.method]
        ura = not train
        assert not (self.stream_int8 and not self.deploy_exact), (
            "stream_int8 models the INT graph's requantized stream — it "
            "only makes sense under deploy_exact QAT"
        )

        if self.deploy_exact:
            from alignq_tpu.quant.ste import requant_ste

            # stem consumes S_IMG-quantized images (kernels/infer.py:141)
            x = requant_ste(x, 3.0 / 127.0, 127)

        out = QConv(
            features=16,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=1,
            use_bias=False,
            w_bit=self.w_bit,
            a_bit=self.a_bit,
            method=self.method,
            variant=self.variant,
            channelwise=self.channelwise,
            mxu_dtype=self.mxu_dtype,
            name="conv0",
        )(x)
        out = BatchNorm(ura, name="bn")(out)
        if ordering == "ours":
            # conv0 -> bn -> act_q0 -> relu (resnet.py:147-151)
            out = QuantAct(
                a_bit=self.a_bit,
                act_range=self.act_range,
                method=self.method,
                variant=self.variant,
                admm=self.admm,
                cdf_impl=self.cdf_impl,
                corr_eps=self.corr_eps,
                name="act_q0",
            )(out, compute_corr)
            out = jax.nn.relu(out)
        elif ordering == "after":
            # conv0 -> bn -> relu -> act_q0 (resnet_after.py:119-123)
            out = jax.nn.relu(out)
            out = QuantAct(
                a_bit=self.a_bit,
                act_range=self.act_range,
                method=self.method,
                variant=self.variant,
                cdf_impl=self.cdf_impl,
                name="act_q0",
            )(out)
        else:
            out = jax.nn.relu(out)

        strides = (
            [1] * self.num_units[0]
            + [2]
            + [1] * (self.num_units[1] - 1)
            + [2]
            + [1] * (self.num_units[2] - 1)
        )
        channels = (
            [16] * self.num_units[0]
            + [32] * self.num_units[1]
            + [64] * self.num_units[2]
        )
        requant_ms = [None] * len(strides)
        requant_g = 127
        if self.deploy_exact:
            from alignq_tpu.kernels.infer import residual_multipliers

            requant_g = 2 ** (self.a_bit - 1) - 1
            requant_ms = residual_multipliers([s != 1 for s in strides])
        for i, (stride, channel) in enumerate(zip(strides, channels)):
            w_bit = self.w_bit if self.block_bits is None else self.block_bits[i]
            out = PreActBlock(
                out_planes=channel,
                stride=stride,
                w_bit=w_bit,
                a_bit=self.a_bit,
                method=self.method,
                variant=self.variant,
                act_range=self.act_range,
                admm=self.admm,
                channelwise=self.channelwise,
                cdf_impl=self.cdf_impl,
                corr_eps=self.corr_eps,
                mxu_dtype=self.mxu_dtype,
                # stream_int8: the edge requant below covers conv input AND
                # shortcut; the block-internal input requant must be off
                requant_m=None if self.stream_int8 else requant_ms[i],
                requant_g=requant_g,
                name=f"layers_{i}",
            )(out, train, compute_corr)
            if self.stream_int8 and i + 1 < len(strides):
                from alignq_tpu.quant.ste import requant_grid_ste

                out = requant_grid_ste(
                    out,
                    self.act_range / requant_g,
                    requant_ms[i + 1],
                    requant_g,
                )

        out = jnp.mean(out, axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten
        out = QDense(features=self.num_classes, name="logit")(out)
        return out


def resnet20_quant(
    bitW: int = 8, abitW: int = 8, method: str = "ours", admm: bool = False, **kw
) -> PreActResNet:
    """reference resnet.py:163-164."""
    return PreActResNet(
        num_units=(3, 3, 3), w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw
    )


def resnet56_quant(
    bitW: int = 8, abitW: int = 8, method: str = "ours", admm: bool = False, **kw
) -> PreActResNet:
    """reference resnet.py:166-167."""
    return PreActResNet(
        num_units=(9, 9, 9), w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw
    )
