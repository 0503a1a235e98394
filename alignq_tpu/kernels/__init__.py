"""Pallas TPU kernels: the fused INT8 inference path.

No reference equivalent — the reference is fake-quant-only PyTorch
(SURVEY.md section 2.0); these kernels realize the BASELINE.json north star:
quantize -> int matmul/conv -> dequant fused on-chip.
"""

from alignq_tpu.kernels.quantize import cdf_quantize_int8
from alignq_tpu.kernels.qmatmul import int8_matmul_dequant

# converters / integer graphs (imported lazily by consumers to keep the
# package import light): infer (PreAct ResNet), infer_mobilenet,
# infer_densenet, infer_resnet_imagenet, convert, artifact

__all__ = ["cdf_quantize_int8", "int8_matmul_dequant"]
