"""Quantized flax modules: QConv, QDense, QuantAct.

Reference factories: conv2d_Q_fn / linear_Q_fn / activation_quantize_fn in
/root/reference/cdf_alignment/resnet-20-cifar-10/model/quantization.py:81-122
and the ADMM twins in
/root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:88-156.

TPU-first design notes:
- Data layout is NHWC / HWIO (XLA-native for TPU convs); the reference's
  NCHW/OIHW is a CUDA convention, not ported.
- Weight fake-quant runs in f32 on the VPU and fuses into the conv's operand
  producer; the conv itself hits the MXU. For low-bit QAT the fake-quantized
  operands are exactly representable in bf16 when the grid is coarse, and the
  `mxu_dtype` knob casts conv operands to bf16 for full MXU rate.
- ADMM correlation matrices are sowed into the 'admm_d' collection instead of
  being read off live module attributes (replaces main.py:295-309 harvesting).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.admm.correlation import corr_discrepancy
from alignq_tpu.quant import baselines
from alignq_tpu.quant.fake_quant import act_cdf, quantize_act, quantize_weight

# torch nn.Conv2d / nn.Linear default init: kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform).
torch_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
torch_linear_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def BatchNorm(use_running_average: bool, name: str | None = None) -> nn.BatchNorm:
    """torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax: 0.9)."""
    return nn.BatchNorm(
        use_running_average=use_running_average,
        momentum=0.9,
        epsilon=1e-5,
        name=name,
    )


class QConv(nn.Module):
    """Quantized 2-D convolution (reference Conv2d_Q, quantization.py:107-122).

    method selects the weight quantizer family:
      'ours'    — AlignQ CDF alignment (variant a/b)
      'uniform' | 'dorefa' | 'bwn' | 'bwnf' — parameter-free baselines
      'lsq'     — learned step size (weight AND activation quant inside conv,
                  reference quantization_lsq.py:66-89)
      'apot'    — additive powers-of-two with learnable clips (weight + act,
                  reference quantization_apot.py:168-191)
      'llsq'    — layerwise learned scale, per-out-channel alpha
                  (reference quantization_llsq.py:78-129)
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = 0
    feature_group_count: int = 1
    use_bias: bool = False
    w_bit: int = 8
    a_bit: int = 8  # only used by lsq/apot in-conv activation quant
    method: str = "ours"
    variant: str = "b"
    channelwise: bool = False  # per-output-channel CDF stats (beyond reference)
    mxu_dtype: Any = None  # e.g. jnp.bfloat16 to force bf16 MXU operands

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        in_features = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", torch_conv_init, (kh, kw, in_features, self.features)
        )

        if self.method == "ours":
            wq = quantize_weight(
                kernel, self.w_bit, variant=self.variant,
                channelwise=self.channelwise,
            ).wq
        elif self.method == "uniform":
            wq = baselines.uniform_weight(kernel, self.w_bit)
        elif self.method == "uniform_admm":
            # C24 ablation weights: raw uniform_q(w), no 1-bit rescale
            # (quantization_uniform_admm.py:71-85).
            from alignq_tpu.quant.ste import uniform_quantize as _uq

            wq = _uq(kernel, self.w_bit)
        elif self.method == "dorefa":
            wq = baselines.dorefa_weight(kernel, self.w_bit)
        elif self.method == "bwn":
            wq = baselines.bwn_weight(kernel, self.w_bit)
        elif self.method == "bwnf":
            wq = baselines.bwnf_weight(kernel, self.w_bit)
        elif self.method == "lsq":
            if self.w_bit < 32:
                s_w = self.param(
                    "lsq_step_w",
                    lambda key: baselines.lsq_init_step(
                        kernel, self.w_bit, is_activation=False
                    ),
                )
                wq = baselines.lsq_quantize(kernel, s_w, self.w_bit, is_activation=False)
            else:
                wq = kernel
            if self.a_bit < 32:
                s_a = self.param("lsq_step_a", nn.initializers.ones, ())
                x = baselines.lsq_quantize(x, s_a, self.a_bit, is_activation=True)
        elif self.method == "apot":
            if self.w_bit < 32:
                wgt_alpha = self.param(
                    "wgt_alpha", nn.initializers.constant(3.0), ()
                )
                wq = baselines.apot_weight(kernel, wgt_alpha, self.w_bit)
            else:
                wq = kernel
            if self.a_bit < 32:
                act_alpha = self.param("act_alpha", nn.initializers.constant(8.0), ())
                b = self.w_bit - 1
                x = baselines.apot_act_quant(x, act_alpha, b, self.w_bit > 2)
        elif self.method == "llsq":
            if self.w_bit < 32:
                alpha_w = self.param(
                    "alpha_w",
                    nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
                    (1, 1, 1, self.features),
                )
                wq = baselines.llsq_weight_quant(kernel, alpha_w, self.w_bit, True)
            else:
                wq = kernel
        elif self.method == "fp":
            wq = kernel
        else:
            raise ValueError(f"unknown quant method {self.method!r}")

        if isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = self.padding

        lhs, rhs = x, wq
        if self.mxu_dtype is not None:
            # single-pass MXU: both operands in bf16; keep the conv OUTPUT in
            # bf16 too (cast after) so the VJP's transposed convs see matching
            # dtypes — preferred_element_type=f32 with bf16 operands breaks
            # under grad (f32 cotangent vs bf16 kernel). The MXU still
            # accumulates in f32 internally.
            lhs = lhs.astype(self.mxu_dtype)
            rhs = rhs.astype(self.mxu_dtype)
            y = jax.lax.conv_general_dilated(
                lhs,
                rhs,
                window_strides=tuple(self.strides),
                padding=pad,
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32)
        else:
            y = jax.lax.conv_general_dilated(
                lhs,
                rhs,
                window_strides=tuple(self.strides),
                padding=pad,
                feature_group_count=self.feature_group_count,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                # operand dtype (not hard-coded f32) keeps the layer
                # dtype-polymorphic — f64 runs (x64 parity tests) accumulate
                # in f64; the f32 default is unchanged
                preferred_element_type=lhs.dtype,
                # TPU's DEFAULT conv precision feeds the MXU bf16 operands —
                # ~1e-2 relative error vs the reference's true-f32 torch conv
                # AND vs the exact-integer INT graph: at W4A4 that flips act
                # codes (1/7 of the range each) and cost 6.6 pts of
                # train-vs-deploy prediction agreement on hardware. HIGHEST =
                # multi-pass true f32. Deliberate bf16 speed stays opt-in via
                # mxu_dtype above.
                precision=jax.lax.Precision.HIGHEST,
            )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_bias_init(kh * kw * in_features), (self.features,)
            )
            y = y + bias
        return y


class QDense(nn.Module):
    """Quantized linear layer (reference linear_Q_fn,
    cdf_alignment/dann_office/model/resnet.py:148-160, commented there but
    part of the API surface; FP heads use method='fp')."""

    features: int
    use_bias: bool = True
    w_bit: int = 32
    method: str = "fp"
    variant: str = "b"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (in_features, self.features))
        if self.method == "ours" and self.w_bit < 32:
            wq = quantize_weight(kernel, self.w_bit, variant=self.variant).wq
        else:
            wq = kernel
        # HIGHEST: true-f32 matmul on TPU (see QConv precision note)
        y = jnp.dot(
            x, wq, preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_bias_init(in_features), (self.features,))
            y = y + bias
        return y


class StageRequant(nn.Module):
    """Calibrated per-channel int8 requantization site.

    Deploy-exact QAT support for feature maps that a deployed graph stores
    as int8 codes with a per-channel scale — DenseNet's stage buffer
    (kernels/infer_densenet.py stage_int8 mode; VERDICT r3 item 1). Unlike
    the ResNet residual stream (exact multiples of act_scale, requantized in
    exact integer arithmetic — quant/ste.py requant_grid_ste), conv-output
    values here live on a per-conv accumulator grid too fine to recover in
    f32, so the scale is CALIBRATED: a per-channel running max |value|
    tracked like a BN statistic ('batch_stats' collection, monotone max —
    deterministic, an upper bound, so the deployed requant clips only on
    values never seen in training).

    QAT fake-quant: value -> clip(round(value/s), -g, g) * s with
    s = amax/g, straight-through gradient inside the clip range
    (quant/ste.py requant_ste, which accepts a per-channel scale vector).
    The deployed graph applies the SAME rounding to the SAME value
    (conv epilogue: codes = round(acc * w_scale / s)), so train == deploy up
    to f32 conv-reduction noise at rounding boundaries (the generic-real
    tie situation of the erf act sites, not the structural .5 ties of the
    grid-aligned residual stream — measured by tools/export_int8.py
    --stage_int8).

    Reference contract: the stage buffer holds the values of
    dense-cifar-10/model/densenet.py:31-41's concatenated features; this
    site changes their storage precision, trained through, and is measured
    against the f32-buffer formulation (+0.00 pt gate).
    """

    g: int = 127
    # Calibrator choice (VERDICT r4 weak #4 — the monotone max is v1):
    #   'max'      running max |value| (deterministic upper bound; one early
    #              outlier permanently inflates the scale)
    #   'ema'      EMA of the per-batch absmax (decays transients away;
    #              values above the stat clip in QAT exactly as deployed)
    #   'ema_p999' EMA of the per-batch per-channel 99.9th |value|
    #              percentile (outlier-robust within a batch too)
    # Default picked by the measured A/B (tools/stage_calib_ab.py;
    # ARCHITECTURE.md stage-calibration table).
    calib: str = "max"
    ema_decay: float = 0.99

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        from alignq_tpu.quant.ste import requant_ste

        amax = self.variable(
            "batch_stats", "amax",
            lambda: jnp.zeros((x.shape[-1],), jnp.float32),
        )
        if train and not self.is_initializing():
            ax = tuple(range(x.ndim - 1))
            absx = jnp.abs(jax.lax.stop_gradient(x))
            if self.calib == "max":
                amax.value = jnp.maximum(amax.value, jnp.max(absx, axis=ax))
            else:
                if self.calib == "ema":
                    stat = jnp.max(absx, axis=ax)
                elif self.calib == "ema_p999":
                    stat = jnp.percentile(absx, 99.9, axis=ax)
                else:
                    raise ValueError(f"unknown StageRequant calib {self.calib!r}")
                # first update seeds the EMA (amax starts at 0)
                amax.value = jnp.where(
                    amax.value > 0,
                    self.ema_decay * amax.value + (1 - self.ema_decay) * stat,
                    stat,
                )
        # the CURRENT step's stat participates (no clipping on this batch
        # under 'max'); eval/convert read the stored stat — same scale as
        # deployment
        scale = jnp.maximum(amax.value, 1e-6) * (1.0 / self.g)
        return requant_ste(x, jax.lax.stop_gradient(scale), self.g)


class QuantAct(nn.Module):
    """Standalone activation fake-quantizer, optionally with the ADMM
    correlation-discrepancy side-output.

    Reference: activation_quantize_fn (quantization.py:81-103) and the ADMM
    variant (admm quantization.py:88-132). When `admm` and `compute_corr` are
    both set, the B x B discrepancy D is sowed into the 'admm_d' collection
    under this module's path; the train step computes the trans-loss from it
    (train/steps.py) so eval stays pure (SURVEY.md hard part 6).

    method semantics:
      'ours'              — CDF alignment
      'uniform'/'dorefa'  — clamp [0,1] + uniform grid
      'llsq'              — learned-scale rounding with octave-search backward
      'fp'                — identity
    """

    a_bit: int = 8
    act_range: float = 2.0
    method: str = "ours"
    variant: str = "b"
    admm: bool = False
    # 'align' FP32 stage (dsan_office/utils/options_office.py:26 STAGE='align'):
    # at a_bit==32 the activation still passes through the CDF transform
    # WITHOUT rounding (quantization.py:92-102 returns activation_cdf) — the
    # alignment-only ablation. Any other stage value keeps the identity
    # short-circuit. No corr loss at 32-bit in either stage (the reference's
    # `method=='ours' and a_bit<32` guard).
    stage: str = "quant"
    # 'erf' (reference-exact) or 'poly' (ERF_SQRT2_POLY grid, quant/cdf.py —
    # the TPU fast path; pair with the same impl at deployment:
    # resnet20_int8_forward(act_impl='poly'))
    cdf_impl: str = "erf"
    # std epsilon in the corr standardization. The r20 reference divides by
    # a raw std (quantization.py:135 — 1/0 for any feature constant across
    # the batch); the office twin guards with +1e-5 (dann_office
    # quantization.py:158-161). We default to the guarded form: with
    # low-bit-quantized upstream activations two samples can tie exactly,
    # and per-shard corr (small B_local) makes that common.
    corr_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, compute_corr: bool = False) -> jax.Array:
        if self.a_bit == 32 and not (self.admm and compute_corr):
            if self.stage == "align" and self.method == "ours":
                # FP32 alignment-only ablation: the CDF transform without
                # rounding (quantization.py:96-102 returns activation_cdf)
                return act_cdf(
                    x, act_range=self.act_range, variant=self.variant,
                    impl=self.cdf_impl,
                )
            return x
        if self.method == "ours":
            if self.admm and compute_corr and self.a_bit < 32:
                b = x.shape[0]
                x_feat = x.reshape(b, -1)
                c = act_cdf(
                    x, act_range=self.act_range, variant=self.variant,
                    impl=self.cdf_impl,
                )
                d = corr_discrepancy(x_feat, c.reshape(b, -1), eps=self.corr_eps)
                self.sow("admm_d", "d", d)
            if self.a_bit == 32:
                # admm+compute_corr fall-through at 32-bit (no corr at 32)
                return (
                    act_cdf(x, act_range=self.act_range, variant=self.variant,
                            impl=self.cdf_impl)
                    if self.stage == "align" else x
                )
            return quantize_act(
                x, self.a_bit, act_range=self.act_range, variant=self.variant,
                impl=self.cdf_impl,
            )
        if self.method in ("uniform", "dorefa"):
            return baselines.uniform_act(x, self.a_bit)
        if self.method in ("bwn", "bwnf"):
            # quantization_bwn.py:62-65: the alpha-scaled line is immediately
            # overwritten — net effect is plain unclamped uniform_q(x).
            from alignq_tpu.quant.ste import uniform_quantize

            return uniform_quantize(x, self.a_bit)
        if self.method == "uniform_admm":
            # Ablation C24 (quantization_uniform_admm.py:88-132): identity
            # "trans" (activation_cdf = x, so D == 0 numerically but the ADMM
            # regularizer terms still contribute) and *unclamped* uniform
            # rounding (uniform_q(x) directly, :110).
            from alignq_tpu.quant.ste import uniform_quantize

            if self.admm and compute_corr and self.a_bit < 32:
                b = x.shape[0]
                x_feat = x.reshape(b, -1)
                d = corr_discrepancy(x_feat, x_feat, eps=self.corr_eps)
                self.sow("admm_d", "d", d)
            return uniform_quantize(x, self.a_bit)
        if self.method == "llsq":
            if self.a_bit == 32:
                return x
            alpha = self.param(
                "alpha", nn.initializers.uniform(scale=1.0), ()
            )
            from alignq_tpu.quant.baselines import quan_alpha

            return baselines.llsq_act_quant(
                x, quan_alpha(alpha, 32), self.a_bit, False
            )
        if self.method == "fp":
            return x
        raise ValueError(f"unknown act quant method {self.method!r}")
