from alignq_tpu.optim.correction import (
    correction_factor,
    scale_by_alignq_correction,
    build_correction_mask,
)
from alignq_tpu.optim.schedules import multistep_schedule, dann_schedule
from alignq_tpu.optim.factory import alignq_sgd

__all__ = [
    "correction_factor",
    "scale_by_alignq_correction",
    "build_correction_mask",
    "multistep_schedule",
    "dann_schedule",
    "alignq_sgd",
]
