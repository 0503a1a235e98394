"""Learning-rate schedules.

- multistep_schedule: torch MultiStepLR (reference main.py:95,129-130 —
  lr * gamma^(#milestones passed), stepped per epoch).
- dann_schedule: the DANN annealing lr / (1 + alpha*p)^beta with the
  per-epoch progress p (reference cdf_alignment/dann_office/main.py:325-338).
"""

from __future__ import annotations

from typing import Sequence

import optax


def multistep_schedule(
    base_lr: float,
    milestones_epochs: Sequence[int],
    gamma: float,
    steps_per_epoch: int,
) -> optax.Schedule:
    """MultiStepLR in units of train steps (milestones given in epochs)."""
    boundaries = {int(e) * steps_per_epoch: gamma for e in milestones_epochs}
    piecewise = optax.piecewise_constant_schedule(1.0, boundaries)

    def schedule(step):
        return base_lr * piecewise(step)

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
