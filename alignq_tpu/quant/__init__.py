from alignq_tpu.quant.ste import round_ste, sign_ste, uniform_quantize
from alignq_tpu.quant.cdf import (
    gaussian_cdf,
    gaussian_pdf2,
    cdf_transform,
    tensor_stats,
)
from alignq_tpu.quant.fake_quant import (
    quantize_weight,
    quantize_act,
    WeightQuantResult,
)
from alignq_tpu.quant import baselines

__all__ = [
    "round_ste",
    "sign_ste",
    "uniform_quantize",
    "gaussian_cdf",
    "gaussian_pdf2",
    "cdf_transform",
    "tensor_stats",
    "quantize_weight",
    "quantize_act",
    "WeightQuantResult",
    "baselines",
]
