"""Learning-rate schedules.

- multistep_schedule: torch MultiStepLR (reference main.py:95,129-130 —
  lr * gamma^(#milestones passed), stepped per epoch).
- dann_schedule: the DANN annealing lr / (1 + alpha*p)^beta with the
  per-epoch progress p (reference cdf_alignment/dann_office/main.py:325-338).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def multistep_schedule(
    base_lr: float,
    milestones_epochs: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
    warmup_epochs: float = 0.0,
) -> optax.Schedule:
    """MultiStepLR in units of train steps (milestones given in epochs).

    warmup_epochs > 0 adds a linear LR warmup — not in the reference (which
    warm-starts every hard config from a pretrained checkpoint instead,
    e.g. mobilenet main.py --pretrained); needed for from-scratch training
    of MobileNetV2-class models, which diverge at the reference lr=0.04
    cold (measured, ARCHITECTURE.md sweep table)."""
    # clamp to int32: the step counter is int32; a boundary past 2^31-1
    # (huge num_epochs or sentinel milestones) would otherwise wrap negative
    # inside optax's comparison and silently pre-decay the LR from step 0
    max_step = 2**31 - 1
    boundaries = {
        min(int(e) * steps_per_epoch, max_step): gamma
        for e in milestones_epochs
    }
    piecewise = optax.piecewise_constant_schedule(1.0, boundaries)
    warmup_steps = warmup_epochs * steps_per_epoch

    def schedule(step):
        lr = base_lr * piecewise(step)
        if warmup_steps > 0:
            lr = lr * jnp.minimum(1.0, (step + 1) / warmup_steps)
        return lr

    return schedule


def dann_schedule(
    base_lr: float,
    total_steps: int,
    alpha: float = 10.0,
    beta: float = 0.75,
) -> optax.Schedule:
    """lr(p) = base_lr / (1 + alpha * p)^beta with p = step / total_steps.

    The reference computes p per-epoch and rebuilds the optimizer
    (dann_office/main.py:325-338); per-step annealing is the continuous
    version and matches the digit driver's per-iteration variant
    (dann_digit/main.py:334-338).
    """

    def schedule(step):
        p = step / max(total_steps, 1)
        return base_lr / (1.0 + alpha * p) ** beta

    return schedule
