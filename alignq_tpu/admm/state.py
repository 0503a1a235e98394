"""ADMM dual state and closed-form z / dual updates.

Reference: ADMM_OPT.step in
/root/reference/cdf_alignment/resnet-20-cifar-10/utils/optimizer.py:60-135.

The reference updates are non-gradient assignments:

  z-update    (optimizer.py:104-114):  V = D + gamma / rho
                                       Z = (1 - (mu/rho)/||V||_2) * V   if ||V||_2 > mu/rho
                                           0                            otherwise
  dual update (optimizer.py:116-124):  gamma <- gamma + rho * (D - Z)

We implement the *intended* semantics. The committed code relies on Python
loop-variable leakage (the gamma branch reads `D_` and `alterD` left over
from the preceding z-branch; SURVEY.md section 2.4.4) and zero-pads D into a
(train_batch, train_batch) buffer; with drop-remainder batching D is always
full-size, so no padding is needed and both updates use the same fresh D/Z.
||.||_2 on a matrix is the Frobenius norm (torch.norm(V, 2) flattens).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from alignq_tpu.admm.loss import ADMMConfig


class ADMMSiteState(NamedTuple):
    """Per-quant-site ADMM variables (reference utils/admm.py:21-22)."""

    alter_d: jax.Array  # (B, B) — the ADMM z variable
    gamma: jax.Array  # (B, B) — the scaled dual


def init_site(key: jax.Array, dim: int, dtype=jnp.float32) -> ADMMSiteState:
    """U[0,1) init matching torch.rand(dim, dim) (utils/admm.py:21-22)."""
    k1, k2 = jax.random.split(key)
    return ADMMSiteState(
        alter_d=jax.random.uniform(k1, (dim, dim), dtype=dtype),
        gamma=jax.random.uniform(k2, (dim, dim), dtype=dtype),
    )


def dual_update(
    state: ADMMSiteState,
    d: jax.Array,
    cfg: ADMMConfig = ADMMConfig(),
) -> ADMMSiteState:
    """One closed-form z + dual step for a single site."""
    d = jax.lax.stop_gradient(d)
    v = d + state.gamma / cfg.rho
    v_norm = jnp.linalg.norm(v)
    thresh = cfg.mu / cfg.rho
    # L2 (block) soft-threshold — optimizer.py:109-112 as a lax.select,
    # branch-free for TPU.
    shrink = 1.0 - thresh / jnp.maximum(v_norm, 1e-12)
    alter_d = jnp.where(v_norm > thresh, shrink * v, jnp.zeros_like(v))
    gamma = state.gamma + cfg.rho * (d - alter_d)
    return ADMMSiteState(alter_d=alter_d, gamma=gamma)


def dual_update_tree(states: dict, ds: dict, cfg: ADMMConfig = ADMMConfig()) -> dict:
    """Apply dual_update across a {site_name: ADMMSiteState} dict given the
    matching {site_name: D} dict harvested from the forward pass."""
    return {
        name: dual_update(states[name], d, cfg) if name in states else states[name]
        for name, d in ds.items()
    } | {name: s for name, s in states.items() if name not in ds}
