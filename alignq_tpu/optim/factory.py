"""Optimizer factory: the AlignQ SGD chain.

Chains, in the reference's order (utils/optimizer.py:212-251):
  1. weight decay added to the raw gradient   (optimizer.py:216-217)
  2. momentum accumulation                    (optimizer.py:218-229)
  3. AlignQ PDF correction on masked leaves   (optimizer.py:231-249, intended)
  4. -lr scaling by schedule                  (optimizer.py:251)
"""

from __future__ import annotations

from typing import Any

import optax

from alignq_tpu.optim.correction import scale_by_alignq_correction


def alignq_sgd(
    learning_rate: float | optax.Schedule,
    *,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    w_bit: int = 8,
    lam: float = 1.0,
    lam2: float = 4.0,
    correction_mask: Any = None,
    use_correction: bool = True,
    channelwise: bool = False,
) -> optax.GradientTransformation:
    """SGD(momentum, wd) with the optional AlignQ analytic gradient correction.

    With use_correction=False (or w_bit == 32) this is exactly torch
    optim.SGD as used by the baseline methods (reference main.py:90-93)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    if use_correction and w_bit < 32:
        parts.append(
            scale_by_alignq_correction(
                w_bit, lam=lam, lam2=lam2, mask=correction_mask,
                channelwise=channelwise,
            )
        )
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


def adam(learning_rate, **kw) -> optax.GradientTransformation:
    """Working Adam (reference C31: dense-cifar-10/utils/optimizer.py defines
    an Adam whose step body is entirely commented out — a silent no-op trap.
    We expose the real thing instead of porting the trap)."""
    return optax.adam(learning_rate, **kw)
