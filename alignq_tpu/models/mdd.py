"""MDD (Margin Disparity Discrepancy) head.

Reference: GradientReverseLayer / MDDNet / MDD in
/root/reference/cdf_alignment_admm/dann_office/model/resnet.py:345-457 —
defined but never constructed by any reference main.py (SURVEY.md C16,
"dead code"); implemented here for API-surface parity and usable as a third
DA method.

The reference's GRL variant anneals its coefficient by mutating the autograd
Function's iter counter (resnet.py:346-364, a torch anti-pattern that only
works pre-torch-1.3); we pass the annealed coefficient explicitly:
    coeff(i) = 2*(hi-lo)/(1+exp(-alpha*i/max_iter)) - (hi-lo) + lo
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from alignq_tpu.models import resnet_imagenet
from alignq_tpu.nn.grl import gradient_reversal
from alignq_tpu.nn.layers import QDense


def mdd_grl_coeff(iter_num, alpha=1.0, low=0.0, high=0.1, max_iter=1000.0):
    """The annealed GRL coefficient (resnet.py:359-363)."""
    return (
        2.0 * (high - low) / (1.0 + jnp.exp(-alpha * iter_num / max_iter))
        - (high - low)
        + low
    )


class _MLPHead(nn.Module):
    width: int
    num_classes: int

    @nn.compact
    def __call__(self, x, train=False):
        x = QDense(self.width, name="fc0")(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return QDense(self.num_classes, name="fc1")(x)


class MDDNet(nn.Module):
    """Base net + bottleneck + dual classifiers (resnet.py:366-410)."""

    arch: str = "resnet50"
    num_classes: int = 31
    bottleneck_dim: int = 1024
    width: int = 1024
    use_bottleneck: bool = True
    w_bit: int = 8
    a_bit: int = 8
    method: str = "ours"
    variant: str = "b"
    act_range: float = 2.0
    admm: bool = False

    def setup(self):
        builder = {
            "resnet18": resnet_imagenet.resnet18_quant,
            "resnet34": resnet_imagenet.resnet34_quant,
            "resnet50": resnet_imagenet.resnet50_quant,
        }[self.arch]
        self.base_network = builder(
            bitW=self.w_bit, abitW=self.a_bit, method=self.method,
            admm=self.admm, variant=self.variant, act_range=self.act_range,
        )
        self.bottleneck_fc = QDense(self.bottleneck_dim, name="bottleneck_fc")
        self.bottleneck_bn = nn.BatchNorm(
            momentum=0.9, epsilon=1e-5, name="bottleneck_bn",
        )
        self.bottleneck_dropout = nn.Dropout(0.5)
        self.classifier_layer = _MLPHead(self.width, self.num_classes, name="classifier")
        self.classifier_layer_2 = _MLPHead(self.width, self.num_classes, name="classifier_adv")

    def __call__(self, x, grl_coeff=0.1, train: bool = False, compute_corr: bool = False):
        features = self.base_network(x, train, compute_corr)
        if self.use_bottleneck:
            features = self.bottleneck_fc(features)
            features = self.bottleneck_bn(features, use_running_average=not train)
            features = jax.nn.relu(features)
            features = self.bottleneck_dropout(features, deterministic=not train)
        features_adv = gradient_reversal(features, grl_coeff)
        outputs_adv = self.classifier_layer_2(features_adv, train)
        outputs = self.classifier_layer(features, train)
        return features, outputs, jax.nn.softmax(outputs, -1), outputs_adv


def mdd_loss(outputs, outputs_adv, labels_source, srcweight: float = 3.0):
    """MDD.get_loss (resnet.py:425-446): classifier CE on the source half +
    the adversarial margin terms over the concatenated [source; target]
    batch."""
    import optax

    n_src = labels_source.shape[0]
    classifier_loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            outputs[:n_src], labels_source
        )
    )
    target_adv = jnp.argmax(outputs, -1)
    adv_src = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(
            outputs_adv[:n_src], target_adv[:n_src]
        )
    )
    # target side: NLL of log(1 - softmax) at the pseudo-labels
    p_tgt = jax.nn.softmax(outputs_adv[n_src:], -1)
    log1m = jnp.log(jnp.clip(1.0 - p_tgt, 1e-6))
    adv_tgt = -jnp.mean(
        jnp.take_along_axis(log1m, target_adv[n_src:, None], axis=-1)
    )
    transfer_loss = srcweight * adv_src + adv_tgt
    return classifier_loss + transfer_loss


def mddnet(bitW=8, abitW=8, method="ours", admm=False, **kw) -> MDDNet:
    return MDDNet(w_bit=bitW, a_bit=abitW, method=method, admm=admm, **kw)
