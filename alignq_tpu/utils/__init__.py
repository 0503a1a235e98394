from alignq_tpu.utils.meters import AverageMeter, accuracy_topk
from alignq_tpu.utils.logging_utils import get_logger, MetricWriter

__all__ = ["AverageMeter", "accuracy_topk", "get_logger", "MetricWriter"]
