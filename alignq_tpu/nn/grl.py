"""Gradient Reversal Layer.

Reference: ReverseLayerF in
/root/reference/cdf_alignment/dann_office/model/resnet.py:421-432 (standalone
copy at model/functions.py:1-17): forward identity, backward -alpha * g.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def gradient_reversal(x: jax.Array, alpha) -> jax.Array:
    return x


def _grl_fwd(x, alpha):
    return x, alpha


def _grl_bwd(alpha, g):
    return (-alpha * g, jnp.zeros_like(jnp.asarray(alpha, dtype=g.dtype)))


gradient_reversal.defvjp(_grl_fwd, _grl_bwd)
