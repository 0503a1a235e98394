"""Running-statistics meters (reference utils/common.py:12-27, 78-92)."""

from __future__ import annotations

import numpy as np


class AverageMeter:
    """Computes and stores the average and current value."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def accuracy_topk(logits: np.ndarray, labels: np.ndarray, topk=(1,)):
    """Top-k accuracy in percent (reference utils/common.py:78-92)."""
    logits = np.asarray(logits)
    labels = np.asarray(labels)
    maxk = max(topk)
    pred = np.argsort(-logits, axis=-1)[:, :maxk]
    correct = pred == labels[:, None]
    return [float(correct[:, :k].any(-1).mean() * 100.0) for k in topk]
