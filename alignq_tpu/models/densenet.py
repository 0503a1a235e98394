"""DenseNet-40 for CIFAR, quantized.

Reference: /root/reference/cdf_alignment/dense-cifar-10/model/densenet.py:17-159.
Pre-activation dense blocks (bn -> act_q -> relu -> conv3x3, concat), 1x1
quantized transition convs with 2x2 avg-pool, compressionRate=1 for the
densenet_40_quant config (densenet.py:158-159), growthRate 12.

The correction set for the optimizer includes the stem conv1 (the DenseNet
driver does NOT drop the first conv — dense-cifar-10/main.py walks all
dense/trans convs; SURVEY.md hard part 1), so configs use
correction_exclude=().
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.nn.layers import BatchNorm, QConv, QDense, QuantAct, StageRequant

# He-normal fan_out init (densenet.py:113-116: normal(0, sqrt(2/n)) with
# n = kh*kw*out_channels)
he_fan_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class DenseBasicBlock(nn.Module):
    growth_rate: int
    w_bit: int
    a_bit: int
    method: str
    variant: str
    act_range: float
    admm: bool
    drop_rate: float = 0.0
    cdf_impl: str = "erf"
    mxu_dtype: jnp.dtype | None = None
    stage_int8: bool = False
    stage_calib: str = "max"

    @nn.compact
    def __call__(self, x, train=False, compute_corr=False):
        out = BatchNorm(not train, name="bn1")(x)
        out = QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, admm=self.admm, cdf_impl=self.cdf_impl,
            name="act_q0",
        )(out, compute_corr)
        out = jax.nn.relu(out)
        out = QConv(
            features=self.growth_rate, kernel_size=(3, 3), padding=1,
            use_bias=False, w_bit=self.w_bit, a_bit=self.a_bit,
            method=self.method, variant=self.variant, name="conv1",
            mxu_dtype=self.mxu_dtype,
        )(out)
        if self.drop_rate > 0 and train:
            out = nn.Dropout(self.drop_rate, deterministic=not train)(out)
        if self.stage_int8:
            # the appended features live in the deployed graph's int8 stage
            # buffer — train through its calibrated per-channel requant
            out = StageRequant(name="requant", calib=self.stage_calib)(out, train)
        return jnp.concatenate([x, out], axis=-1)


class Transition(nn.Module):
    out_planes: int
    w_bit: int
    a_bit: int
    method: str
    variant: str
    act_range: float
    admm: bool
    cdf_impl: str = "erf"
    mxu_dtype: jnp.dtype | None = None
    stage_int8: bool = False
    stage_calib: str = "max"

    @nn.compact
    def __call__(self, x, train=False, compute_corr=False):
        out = BatchNorm(not train, name="bn1")(x)
        out = QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, admm=self.admm, cdf_impl=self.cdf_impl,
            name="act_q0",
        )(out, compute_corr)
        out = jax.nn.relu(out)
        out = QConv(
            features=self.out_planes, kernel_size=(1, 1), padding=0,
            use_bias=False, w_bit=self.w_bit, a_bit=self.a_bit,
            method=self.method, variant=self.variant, name="conv1",
            mxu_dtype=self.mxu_dtype,
        )(out)
        out = nn.avg_pool(out, (2, 2), strides=(2, 2))
        if self.stage_int8:
            # the pooled transition output seeds the next stage's int8 buffer
            out = StageRequant(name="requant", calib=self.stage_calib)(out, train)
        return out


class DenseNet(nn.Module):
    depth: int = 40
    growth_rate: int = 12
    compression_rate: int = 1
    num_classes: int = 10
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    drop_rate: float = 0.0
    cdf_impl: str = "erf"
    mxu_dtype: jnp.dtype | None = None
    # Deploy-exact QAT: DenseNet is pre-activation (bn -> act_q -> relu ->
    # conv), so every INT-graph conv input is exactly relu(act codes) and the
    # ONLY train!=deploy requant site is the image stem
    # (kernels/infer_densenet.py: "no requantization step exists anywhere
    # except the image stem"). Use with variant='int8'.
    deploy_exact: bool = False
    # int8 STAGE BUFFER (VERDICT r3 item 1): train through the calibrated
    # per-channel requant the deployed graph applies when it stores each
    # stage's growing feature map as int8 codes (4x less HBM traffic on the
    # 12 full-width re-reads per stage — DenseNet's dominant deployment
    # cost, ARCHITECTURE.md). Sites: stem output, every dense block's
    # appended features, every transition's pooled output. Pair with
    # deploy_exact=True and deploy via
    # densenet40_int8_forward(stage_int8=True).
    stage_int8: bool = False
    # StageRequant calibrator ('max' | 'ema' | 'ema_p999' — nn/layers.py)
    stage_calib: str = "max"

    @nn.compact
    def __call__(self, x, train: bool = False, compute_corr: bool = False):
        assert (self.depth - 4) % 3 == 0, "depth should be 3n+4"
        if self.deploy_exact:
            from alignq_tpu.quant.ste import requant_ste

            # stem consumes S_IMG-quantized images (infer_densenet.py
            # convert: qconv(None, 'conv1', S_IMG))
            x = requant_ste(x, 3.0 / 127.0, 127)
        n = (self.depth - 4) // 3
        kw = dict(
            w_bit=self.w_bit, a_bit=self.a_bit, method=self.method,
            variant=self.variant, act_range=self.act_range, admm=self.admm,
            cdf_impl=self.cdf_impl, mxu_dtype=self.mxu_dtype,
            stage_int8=self.stage_int8, stage_calib=self.stage_calib,
        )
        inplanes = self.growth_rate * 2
        out = QConv(
            features=inplanes, kernel_size=(3, 3), padding=1, use_bias=False,
            w_bit=self.w_bit, a_bit=self.a_bit, method=self.method,
            variant=self.variant, name="conv1", mxu_dtype=self.mxu_dtype,
        )(x)
        if self.stage_int8:
            # the stem output seeds stage 1's int8 buffer
            out = StageRequant(name="requant_stem", calib=self.stage_calib)(out, train)
        for stage in range(3):
            for i in range(n):
                out = DenseBasicBlock(
                    growth_rate=self.growth_rate, drop_rate=self.drop_rate,
                    name=f"dense{stage+1}_{i}", **kw,
                )(out, train, compute_corr)
                inplanes += self.growth_rate
            if stage < 2:
                inplanes = inplanes // self.compression_rate
                out = Transition(out_planes=inplanes, name=f"trans{stage+1}", **kw)(
                    out, train, compute_corr
                )
        out = BatchNorm(not train, name="bn")(out)
        out = QuantAct(
            a_bit=self.a_bit, act_range=self.act_range, method=self.method,
            variant=self.variant, admm=self.admm, cdf_impl=self.cdf_impl,
            name="act_q0",
        )(out, compute_corr)
        out = jax.nn.relu(out)
        out = jnp.mean(out, axis=(1, 2))  # AvgPool2d(8) on 8x8 + flatten
        return QDense(features=self.num_classes, name="fc")(out)


def densenet_40_quant(
    bitW: int = 8, abitW: int = 8, method: str = "ours", admm: bool = False, **kw
) -> DenseNet:
    """reference densenet.py:158-159 (compressionRate=1)."""
    return DenseNet(
        depth=40, compression_rate=1, w_bit=bitW, a_bit=abitW,
        method=method, admm=admm, **kw,
    )
