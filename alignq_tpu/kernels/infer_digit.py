"""True-INT8 digit DANN CNN inference graph.

Shadows the QAT forward of models/dann.py MNISTModelQuant (reference
cdf_alignment/dann_digit/model/dann.py:125-230, 'ours' ordering) with the
production-site scheme of infer.py:

- conv1/conv2 (5x5 valid, WITH bias — dann.py Conv2d defaults) fold with
  their BatchNorms into int8 convs + per-channel f32 epilogues; the conv
  bias is absorbed into the BN mean (BN(Wx + b) shifts mean by -b);
- act sites emit erf codes at production (post conv+bn), then relu and the
  2x2 maxpool run ON CODES (the act grid is monotonic, so the max of grid
  values is the grid value of the max code); conv2 consumes the pooled
  codes losslessly as int8 — no requantization site exists in the trunk;
- the stem consumes digit images at S_DIGIT = 1/127: digit pipelines
  normalize with mean/std 0.5 (data/digits.py DIGIT_MEAN/STD), so inputs
  lie exactly in [-1, 1] and the full code range is used with zero clip;
- the classifier/discriminator MLP heads stay f32 (QDense heads are FP by
  design — the reference's quant Linear is commented out,
  dann_office/model/resnet.py:148-160); their BatchNorm1d running stats
  fold to per-feature affines. Dropout and the GRL are training-only.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import fold_conv_bn
from alignq_tpu.kernels.infer import _act_g, _erfq_codes, _linear_q

# digit pipelines normalize to mean/std 0.5: values in [-1, 1] exactly
S_DIGIT = 1.0 / 127.0


def _bn1d_affine(p, s, eps: float = 1e-5):
    inv = p["scale"] / jnp.sqrt(s["var"] + eps)
    return {
        "scale": inv.astype(jnp.float32),
        "bias": (p["bias"] - s["mean"] * inv).astype(jnp.float32),
    }


def convert_mnist_dann(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> Dict[str, Any]:
    """Fold a trained MNISTModelQuant into (int8 conv trunk, f32 heads)."""
    act_scale = 2.0 / _act_g(act_bits)

    def fold(conv, bn, in_scale):
        # conv has a bias b: BN(Wx + b) == BN' with mean shifted to mean - b
        return fold_conv_bn(
            params[conv]["kernel"],
            params[bn]["scale"],
            params[bn]["bias"],
            batch_stats[bn]["mean"] - params[conv]["bias"],
            batch_stats[bn]["var"],
            act_scale=in_scale,
            bits=weight_bits,
        )

    def mlp(name, n_bn):
        head = {}
        for i in range(n_bn + 1):
            head[f"fc{i}"] = dict(params[name][f"fc{i}"])
        for i in range(n_bn):
            head[f"bn{i}"] = _bn1d_affine(
                params[name][f"bn{i}"], batch_stats[name][f"bn{i}"]
            )
        return head

    return {
        "conv1": fold("conv1", "conv1_bn", S_DIGIT),
        "conv2": fold("conv2", "conv2_bn", act_scale),
        # classifier: fc0-bn0-relu-fc1-bn1-relu-fc2 (dann.py:206-214)
        "classifier": mlp("classifier", 2),
        # discriminator: fc0-bn0-relu-fc1 (dann.py:216-221)
        "discriminator": mlp("discriminator", 1),
    }


def _mlp_forward(head: Dict[str, Any], x: jax.Array, n_bn: int) -> jax.Array:
    for i in range(n_bn):
        x = jnp.dot(
            x, head[f"fc{i}"]["kernel"], precision=jax.lax.Precision.HIGHEST
        ) + head[f"fc{i}"]["bias"]
        x = x * head[f"bn{i}"]["scale"] + head[f"bn{i}"]["bias"]
        x = jax.nn.relu(x)
    last = f"fc{n_bn}"
    return jnp.dot(
        x, head[last]["kernel"], precision=jax.lax.Precision.HIGHEST
    ) + head[last]["bias"]


def mnist_dann_int8_forward(
    qparams: Dict[str, Any],
    x: jax.Array,
    act_bits: int = 8,
    act_impl: str = "erf",
) -> tuple[jax.Array, jax.Array]:
    """Returns (class_logits, domain_logits); the GRL is identity at
    inference, so the domain head reads the same feature."""
    act_scale = 2.0 / _act_g(act_bits)
    if x.shape[-1] == 1:
        x = jnp.tile(x, (1, 1, 1, 3))  # dann.py:223 input_data.expand

    def conv_block(x_int8, q):
        acc = jax.lax.conv_general_dilated(
            x_int8,
            q.kernel_int8,
            window_strides=(1, 1),
            padding=[(0, 0)] * 2,  # 5x5 VALID (dann.py kernel_size=5)
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        h = acc.astype(jnp.float32) * q.scale + q.bias
        codes = jnp.maximum(_erfq_codes(h, act_bits, act_impl), 0)
        # 2x2 maxpool on codes: monotonic grid, so pooled codes == codes of
        # pooled values
        return jax.lax.reduce_window(
            codes, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID",
        )

    c = conv_block(_linear_q(x, S_DIGIT), qparams["conv1"])
    c = conv_block(c, qparams["conv2"])
    feat = c.astype(jnp.float32).reshape(c.shape[0], -1) * act_scale

    cls = _mlp_forward(qparams["classifier"], feat, 2)
    dom = _mlp_forward(qparams["discriminator"], feat, 1)
    return cls, dom
