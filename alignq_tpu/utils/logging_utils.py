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


def dump_config(cfg, job_dir: str) -> str:
    """Write the run's config dataclass to job_dir/config.json.

    Reference: the args dump to config.txt at run start
    (utils/common.py:49-54) — the reference writes `k: v` text lines; we
    write JSON (machine-reloadable) with the same purpose: every run
    directory records exactly the configuration that produced it."""
    import dataclasses

    os.makedirs(job_dir, exist_ok=True)
    path = os.path.join(job_dir, "config.json")
    raw = dataclasses.asdict(cfg)
    rec = {k: (list(v) if isinstance(v, tuple) else v) for k, v in raw.items()}
    with open(path, "w") as f:
        json.dump(rec, f, indent=2, sort_keys=True)
        f.write("\n")
    return path


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
