from alignq_tpu.nn.layers import (
    QConv,
    QDense,
    QuantAct,
    StageRequant,
    BatchNorm,
    torch_conv_init,
    torch_linear_init,
)
from alignq_tpu.nn.grl import gradient_reversal

__all__ = [
    "QConv",
    "QDense",
    "QuantAct",
    "StageRequant",
    "BatchNorm",
    "torch_conv_init",
    "torch_linear_init",
    "gradient_reversal",
]
