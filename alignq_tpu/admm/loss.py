"""ADMM augmented-Lagrangian transformation loss.

Reference: class ADMM in
/root/reference/cdf_alignment/resnet-20-cifar-10/utils/admm.py:12-33.

Per quant site the reference keeps learnable-by-assignment (dim, dim)
matrices alterD (the ADMM z variable) and gamma (the scaled dual), with
constants mu=0.2, rho=0.3, and evaluates

    loss = mu * mean|Z| + rho/2 * sqrt(mean((D - Z)^2)) + mean(gamma * |D - Z|)

In the functional design these matrices live in the train state
(admm/state.py) — they are updated by closed-form assignment, not gradients —
and this loss is a pure function differentiated only w.r.t. D (which carries
gradient back into the activations through the correlation matrices).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ADMMConfig(NamedTuple):
    """Constants from reference utils/admm.py:19-20."""

    mu: float = 0.2
    rho: float = 0.3


def admm_loss(
    d: jax.Array,
    alter_d: jax.Array,
    gamma: jax.Array,
    cfg: ADMMConfig = ADMMConfig(),
) -> jax.Array:
    """Augmented-Lagrangian value (utils/admm.py:24-33).

    The reference slices alterD/gamma to D's shape to handle a short final
    batch (admm.py:26-27); we use drop-remainder batching so shapes are
    static and always full — jit-friendly, no dynamic slicing.
    """
    alter_d = jax.lax.stop_gradient(alter_d)
    gamma = jax.lax.stop_gradient(gamma)
    loss_reg = cfg.mu * jnp.mean(jnp.abs(alter_d))
    loss_constraint = cfg.rho / 2.0 * jnp.sqrt(jnp.mean((d - alter_d) ** 2))
    loss_relax = jnp.mean(gamma * jnp.abs(d - alter_d))
    return loss_reg + loss_constraint + loss_relax
