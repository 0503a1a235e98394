"""MobileNet-V2 for SVHN, quantized (depthwise-separable inverted residuals).

Reference: /root/reference/cdf_alignment/mobilenet-v2-svhn/model/mobilenetV2.py:25-135.
Quirks preserved:
- conv2 is depthwise (groups=planes, mobilenetV2.py:40) -> feature_group_count
- a quantized 1x1 shortcut conv even where identity would suffice
  (mobilenetV2.py:46-53), applied only for stride==1 blocks, followed by
  bn -> act_skip -> ReLU
- blocks use ReLU6 after act_q1/act_q2 and NO relu after act_q3
  (mobilenetV2.py:55-73); the head uses plain ReLU (mobilenetV2.py:114-125)
- stem stride 1 (32x32 SVHN inputs), final AvgPool2d(4)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.nn.layers import BatchNorm, QConv, QDense, QuantAct

# (expansion, out_planes, num_blocks, stride) — mobilenetV2.py:77-83
CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 1),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class InvertedResidual(nn.Module):
    out_planes: int
    expansion: int
    stride: int
    w_bit: int
    a_bit: int
    method: str
    variant: str
    act_range: float
    admm: bool
    cdf_impl: str = "erf"
    mxu_dtype: jnp.dtype | None = None
    # deploy-exact block-input requantization (QAT->deploy gap closure):
    # the INT graph requantizes the previous residual block's output
    # a3 + relu(sc) — codes in [-g, 2g] on the act grid — onto the m=2
    # block-input grid before conv1/shortcut consume it
    # (kernels/infer_mobilenet.py _requant_codes(out_c, m_in, g,
    # signed=True)). signed: a3 has no trailing relu, so the stream
    # carries negative codes. None = off (block follows a stride-2 block
    # or the stem, where the m=1 requant is a lossless clamp the QAT
    # values never reach).
    requant_m: int | None = None
    requant_g: int = 127

    def _act(self, name):
        return QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, admm=self.admm, cdf_impl=self.cdf_impl,
            name=name,
        )

    @nn.compact
    def __call__(self, x, train=False, compute_corr=False):
        in_planes = x.shape[-1]
        planes = self.expansion * in_planes
        kw = dict(
            use_bias=False, w_bit=self.w_bit, a_bit=self.a_bit,
            method=self.method, variant=self.variant,
            mxu_dtype=self.mxu_dtype,
        )
        ura = not train

        if self.requant_m is not None:
            from alignq_tpu.quant.ste import requant_grid_ste

            x = requant_grid_ste(
                x,
                self.act_range / self.requant_g,
                self.requant_m,
                self.requant_g,
                True,  # signed: block outputs carry negative act_q3 codes
            )

        out = QConv(features=planes, kernel_size=(1, 1), padding=0, name="conv1", **kw)(x)
        out = BatchNorm(ura, name="bn1")(out)
        out = self._act("act_q1")(out, compute_corr)
        out = jnp.minimum(jax.nn.relu(out), 6.0)  # ReLU6

        out = QConv(
            features=planes, kernel_size=(3, 3), strides=(self.stride, self.stride),
            padding=1, feature_group_count=planes, name="conv2", **kw,
        )(out)
        out = BatchNorm(ura, name="bn2")(out)
        out = self._act("act_q2")(out, compute_corr)
        out = jnp.minimum(jax.nn.relu(out), 6.0)

        out = QConv(features=self.out_planes, kernel_size=(1, 1), padding=0, name="conv3", **kw)(out)
        out = BatchNorm(ura, name="bn3")(out)
        out = self._act("act_q3")(out, compute_corr)

        if self.stride == 1:
            sc = QConv(
                features=self.out_planes, kernel_size=(1, 1), padding=0,
                name="shortcut_conv", **kw,
            )(x)
            sc = BatchNorm(ura, name="shortcut_bn")(sc)
            sc = self._act("act_skip")(sc, compute_corr)
            sc = jax.nn.relu(sc)
            out = out + sc
        return out


class MobileNetV2(nn.Module):
    num_classes: int = 10
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    cdf_impl: str = "erf"
    mxu_dtype: jnp.dtype | None = None
    # Deploy-exact QAT (VERDICT round-1 item 3, extended to the depthwise
    # family): fake-quantize at the stem-input and residual block-edge
    # requant sites exactly as the INT graph does at inference
    # (kernels/infer_mobilenet.py: _linear_q(x, S_IMG) stem + signed m=2
    # requant after every stride-1 block), so train == deploy. Use with
    # variant='int8' (the deployable grid).
    deploy_exact: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, compute_corr: bool = False):
        ura = not train
        kw = dict(
            w_bit=self.w_bit, a_bit=self.a_bit, method=self.method,
            variant=self.variant, act_range=self.act_range, admm=self.admm,
            cdf_impl=self.cdf_impl, mxu_dtype=self.mxu_dtype,
        )
        requant_g = 2 ** (self.a_bit - 1) - 1
        if self.deploy_exact:
            from alignq_tpu.quant.ste import requant_ste

            # stem consumes S_IMG-quantized images (infer_mobilenet.py
            # convert: fold_path(None, 'conv1', 'bn1', S_IMG))
            x = requant_ste(x, 3.0 / 127.0, 127)
        out = QConv(
            features=32, kernel_size=(3, 3), padding=1, use_bias=False,
            w_bit=self.w_bit, a_bit=self.a_bit, method=self.method,
            variant=self.variant, name="conv1", mxu_dtype=self.mxu_dtype,
        )(x)
        out = BatchNorm(ura, name="bn1")(out)
        out = QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, admm=self.admm, cdf_impl=self.cdf_impl,
            name="act_q1",
        )(out, compute_corr)
        out = jax.nn.relu(out)

        idx = 0
        # stream-grid multiplier entering each block: 1 after the stem or a
        # stride-2 block (bare act codes), 2 after a stride-1 block (residual
        # sum a3 + relu(sc), codes in [-g, 2g]) — infer_mobilenet.py m_in
        m_in = 1
        for expansion, out_planes, num_blocks, stride in CFG:
            for s in [stride] + [1] * (num_blocks - 1):
                out = InvertedResidual(
                    out_planes=out_planes, expansion=expansion, stride=s,
                    name=f"layers_{idx}",
                    requant_m=(
                        m_in if self.deploy_exact and m_in > 1 else None
                    ),
                    requant_g=requant_g,
                    **kw,
                )(out, train, compute_corr)
                m_in = 2 if s == 1 else 1
                idx += 1

        if self.deploy_exact and m_in > 1:
            from alignq_tpu.quant.ste import requant_grid_ste

            # the head conv consumes the last residual block's output through
            # the same signed requant (infer_mobilenet.py: conv2 input)
            out = requant_grid_ste(
                out, self.act_range / requant_g, m_in, requant_g, True
            )
        out = QConv(
            features=1280, kernel_size=(1, 1), padding=0, use_bias=False,
            w_bit=self.w_bit, a_bit=self.a_bit, method=self.method,
            variant=self.variant, name="conv2", mxu_dtype=self.mxu_dtype,
        )(out)
        out = BatchNorm(ura, name="bn2")(out)
        out = QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, admm=self.admm, cdf_impl=self.cdf_impl,
            name="act_q2",
        )(out, compute_corr)
        out = jax.nn.relu(out)
        out = jnp.mean(out, axis=(1, 2))  # AvgPool2d(4) on 4x4 + flatten
        return QDense(features=self.num_classes, name="linear")(out)


def mobile_v2(
    bitW: int = 8, abitW: int = 8, method: str = "ours", admm: bool = False, **kw
) -> MobileNetV2:
    """reference mobilenetV2.py:134-135."""
    return MobileNetV2(w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)
