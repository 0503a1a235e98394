from alignq_tpu.models.resnet_cifar import (
    PreActResNet,
    resnet20_quant,
    resnet56_quant,
)
from alignq_tpu.models.densenet import DenseNet, densenet_40_quant
from alignq_tpu.models.mobilenetv2 import MobileNetV2, mobile_v2
from alignq_tpu.models.resnet_imagenet import (
    ResNetFeature,
    resnet18_quant,
    resnet34_quant,
    resnet50_quant,
)
from alignq_tpu.models.mdd import MDDNet, mdd_grl_coeff, mdd_loss, mddnet
from alignq_tpu.models.dann import (
    DANN,
    DSAN,
    MNISTModelQuant,
    mnist_model_quant,
    resnet18_dann,
    resnet34_dann,
    resnet50_dann,
    resnet50_dsan,
)

__all__ = [
    "PreActResNet",
    "resnet20_quant",
    "resnet56_quant",
    "DenseNet",
    "densenet_40_quant",
    "MobileNetV2",
    "mobile_v2",
    "ResNetFeature",
    "resnet18_quant",
    "resnet34_quant",
    "resnet50_quant",
    "DANN",
    "DSAN",
    "MNISTModelQuant",
    "mnist_model_quant",
    "resnet18_dann",
    "resnet34_dann",
    "resnet50_dann",
    "resnet50_dsan",
]
