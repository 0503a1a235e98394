"""File+stream logger and metric writer.

Reference: get_logger (utils/common.py:63-76) and the tensorboardX scalar
writers (main.py:32-33). We write JSONL metric streams (greppable,
dependency-free) instead of tensorboard event files; the schema carries the
same scalars (Performance_loss, Train-top-1, ...)."""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Mapping


def get_logger(file_path: str | None = None, name: str = "alignq") -> logging.Logger:
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s | %(message)s", "%m/%d %H:%M:%S")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if file_path:
        os.makedirs(os.path.dirname(file_path), exist_ok=True)
        fh = logging.FileHandler(file_path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


class MetricWriter:
    """Append-only JSONL scalar stream, one file per split."""

    def __init__(self, job_dir: str, split: str):
        os.makedirs(os.path.join(job_dir, "run"), exist_ok=True)
        self.path = os.path.join(job_dir, "run", f"{split}.jsonl")
        self._f = open(self.path, "a", buffering=1)

    def write(self, step: int, scalars: Mapping[str, float]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()
