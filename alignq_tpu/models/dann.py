"""Domain-adaptation heads: DANN (GRL + domain classifier), DSAN (LMMD),
MDD (reference dead code, kept for API parity), and the digit DANN CNN.

References:
- DANN: /root/reference/cdf_alignment/dann_office/model/resnet.py:421-462
  (ADMM twin returns (class_out, domain_out, trans_loss),
  /root/reference/cdf_alignment_admm/dann_office/model/resnet.py:328-334 —
  here trans-loss assembly stays in the train step via the 'admm_d'
  collection).
- DSAN: /root/reference/cdf_alignment/dsan_office/model/resnet.py:333-370
  (bottleneck 2048->256 optional; training forward computes LMMD between
  source and softmaxed target predictions).
- MDD (dead code in reference):
  /root/reference/cdf_alignment_admm/dann_office/model/resnet.py:345-457.
- digit CNN: /root/reference/cdf_alignment/dann_digit/model/dann.py:125-230
  (method-dependent layer ordering; classifier/discriminator MLPs with
  BatchNorm1d).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.models import resnet_imagenet
from alignq_tpu.nn.grl import gradient_reversal
from alignq_tpu.nn.layers import BatchNorm, QConv, QDense, QuantAct


class DANN(nn.Module):
    """Feature net + class head (31 cls) + domain head on reversed features
    (resnet.py:435-453)."""

    arch: str = "resnet50"
    num_classes: int = 31
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    stage: str = "quant"  # 'align' = FP32 CDF-only ablation (options_office.py:26)
    cdf_impl: str = "erf"

    def setup(self):
        builder = {
            "resnet18": resnet_imagenet.resnet18_quant,
            "resnet34": resnet_imagenet.resnet34_quant,
            "resnet50": resnet_imagenet.resnet50_quant,
        }[self.arch]
        self.feature = builder(
            bitW=self.w_bit, abitW=self.a_bit, method=self.method,
            admm=self.admm, variant=self.variant, act_range=self.act_range,
            stage=self.stage, cdf_impl=self.cdf_impl,
        )
        self.class_classifier = QDense(self.num_classes, name="class_classifier")
        self.domain_classifier = QDense(2, name="domain_classifier")

    def __call__(self, x, alpha=1.0, train: bool = False, compute_corr: bool = False):
        feature = self.feature(x, train, compute_corr)
        reverse_feature = gradient_reversal(feature, alpha)
        class_output = self.class_classifier(feature)
        domain_output = self.domain_classifier(reverse_feature)
        return class_output, domain_output


class DSAN(nn.Module):
    """DSAN head (dsan_office/model/resnet.py:333-361): feature + optional
    bottleneck + cls head. Returns (source_pred, source_feat, target_pred,
    target_feat); the LMMD loss is computed in the train step (train/da.py)
    so eval stays pure."""

    arch: str = "resnet50"
    num_classes: int = 31
    bottle_neck: bool = True
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    stage: str = "quant"  # reference DSAN default is 'align' (options_office.py:26)
    cdf_impl: str = "erf"

    def setup(self):
        builder = {
            "resnet18": resnet_imagenet.resnet18_quant,
            "resnet34": resnet_imagenet.resnet34_quant,
            "resnet50": resnet_imagenet.resnet50_quant,
        }[self.arch]
        self.feature_layers = builder(
            bitW=self.w_bit, abitW=self.a_bit, method=self.method,
            admm=self.admm, variant=self.variant, act_range=self.act_range,
            stage=self.stage, cdf_impl=self.cdf_impl,
        )
        if self.bottle_neck:
            self.bottle = QDense(256, name="bottle")
        self.cls_fc = QDense(self.num_classes, name="cls_fc")

    def embed(self, x, train: bool = False, compute_corr: bool = False):
        f = self.feature_layers(x, train, compute_corr)
        if self.bottle_neck:
            f = self.bottle(f)
        return f

    def __call__(self, source, target=None, train: bool = False, compute_corr: bool = False):
        s_feat = self.embed(source, train, compute_corr)
        s_pred = self.cls_fc(s_feat)
        if target is None:
            return s_pred
        t_feat = self.embed(target, train, compute_corr)
        t_pred = self.cls_fc(t_feat)
        return s_pred, s_feat, t_pred, t_feat


class GRLMlp(nn.Module):
    """Two-layer MLP with BatchNorm1d + ReLU (digit heads, dann.py:206-221)."""

    widths: tuple

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, w in enumerate(self.widths[:-1]):
            x = QDense(w, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = jax.nn.relu(x)
        return QDense(self.widths[-1], name=f"fc{len(self.widths)-1}")(x)


class MNISTModelQuant(nn.Module):
    """Digit DANN CNN (dann.py:125-230): 2 conv (32, 48 ch, 5x5 valid) +
    3-FC classifier + 2-FC discriminator; method-dependent ordering."""

    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False
    cdf_impl: str = "erf"
    # the reference uses nn.Dropout2d (dann.py:153) — CHANNEL dropout, not
    # element dropout; broadcast_dims=(1,2) below reproduces it. 0.0 turns
    # the site off (tools/reference_parity_digit.py determinism shim).
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, alpha=1.0, train: bool = False, compute_corr: bool = False):
        ura = not train
        kw = dict(use_bias=True, w_bit=self.w_bit, a_bit=self.a_bit,
                  method=self.method, variant=self.variant)
        act_kw = dict(a_bit=self.a_bit, act_range=self.act_range,
                      method=self.method, variant=self.variant, admm=self.admm,
                      cdf_impl=self.cdf_impl)
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))  # expand to 3 channels (dann.py:223)

        ordering = "ours" if self.method in ("ours", "uniform_admm") else (
            "after" if self.method in ("dorefa", "uniform", "llsq", "bwn", "bwnf")
            else "none"
        )

        def conv_block(x, feats, name, dropout):
            x = QConv(feats, (5, 5), (1, 1), 0, name=name, **kw)(x)
            x = BatchNorm(ura, name=f"{name}_bn")(x)
            if ordering == "ours":
                x = QuantAct(name=f"{name}_actq", **act_kw)(x, compute_corr)
                if dropout:
                    x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2), deterministic=ura)(x)
                x = jax.nn.relu(x)
            elif ordering == "after":
                if dropout:
                    x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2), deterministic=ura)(x)
                x = jax.nn.relu(x)
                x = QuantAct(name=f"{name}_actq", **act_kw)(x, compute_corr)
            else:
                if dropout:
                    x = nn.Dropout(self.dropout_rate, broadcast_dims=(1, 2), deterministic=ura)(x)
                x = jax.nn.relu(x)
            return nn.max_pool(x, (2, 2), strides=(2, 2))

        x = conv_block(x, 32, "conv1", dropout=False)
        x = conv_block(x, 48, "conv2", dropout=True)
        feature = x.reshape(x.shape[0], -1)  # 48*4*4 for 28x28 inputs

        reverse_feature = gradient_reversal(feature, alpha)
        class_output = GRLMlp((100, 100, 10), name="classifier")(feature, train)
        domain_output = GRLMlp((100, 2), name="discriminator")(reverse_feature, train)
        return class_output, domain_output


def resnet50_dann(bitW=8, abitW=8, method="ours", admm=False, **kw) -> DANN:
    return DANN(arch="resnet50", w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)


def resnet34_dann(bitW=8, abitW=8, method="ours", admm=False, **kw) -> DANN:
    return DANN(arch="resnet34", w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)


def resnet18_dann(bitW=8, abitW=8, method="ours", admm=False, **kw) -> DANN:
    return DANN(arch="resnet18", w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)


def resnet50_dsan(bitW=8, abitW=8, method="ours", admm=False, **kw) -> DSAN:
    return DSAN(arch="resnet50", w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)


def mnist_model_quant(bitW=8, abitW=8, method="ours", admm=False, **kw) -> MNISTModelQuant:
    return MNISTModelQuant(w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)
