"""Cross-device ADMM correlation modes (SURVEY.md section 5, long-context
entry).

The B x B correlation matrix is AlignQ's only cross-batch-coupled
computation. Under data parallelism there are two semantics:

- 'gather' (exact): the correlation is over the GLOBAL batch. This is what
  plain jit/GSPMD produces automatically from a batch sharded over 'data' —
  XLA inserts the all-gather for the (B, F) x (F, B) contraction. Duals are
  (B_global, B_global), replicated. Matches the reference's math exactly but
  moves B x C*H*W activations per quant site over ICI.

- 'local' (block-diagonal approximation): each shard computes its own
  B_local x B_local matrix over its sub-batch; zero communication for the
  corr path (gradients still psum). Duals get a leading device axis
  (n_data, B_local, B_local) sharded over 'data' — each shard anneals its
  own duals. This trades an O(B^2) coupling for embarrassing parallelism; the
  train-state shape difference is explicit so checkpoints are
  self-describing.

This module implements 'local' via shard_map; 'gather' is the default jit
path (tests/test_dist.py shows sharded == single-device for it).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from alignq_tpu.admm.state import ADMMSiteState, init_site
from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.state import TrainState
from alignq_tpu.train.steps import make_train_step


def create_local_duals(
    rng: jax.Array, site_names, cfg: TrainConfig, n_data: int
) -> Dict[str, ADMMSiteState]:
    """Per-shard duals: (n_data, B_local, B_local) per site."""
    assert cfg.train_batch_size % n_data == 0, (cfg.train_batch_size, n_data)
    b_local = cfg.train_batch_size // n_data
    duals = {}
    keys = jax.random.split(rng, max(len(site_names) * n_data, 1))
    i = 0
    for name in sorted(site_names):
        shards = []
        for _ in range(n_data):
            shards.append(init_site(keys[i], b_local))
            i += 1
        duals[name] = ADMMSiteState(
            alter_d=jnp.stack([s.alter_d for s in shards]),
            gamma=jnp.stack([s.gamma for s in shards]),
        )
    return duals


def make_local_corr_train_step(model, cfg: TrainConfig, mesh: Mesh, data_axis: str = "data"):
    """shard_map train step: per-shard corr/duals, psum'd grads/metrics.

    The returned function takes (state, images, labels) where
    state.admm_duals leaves have the leading device axis and images/labels
    are global-batch arrays (placed with shard_batch)."""
    inner = make_train_step(model, cfg, axis_name=data_axis)

    def shard_fn(state: TrainState, images, labels):
        # inside: duals arrive as (1, Bl, Bl) — strip/restore the dev axis
        local_duals = {
            k: ADMMSiteState(v.alter_d[0], v.gamma[0])
            for k, v in state.admm_duals.items()
        }
        local_state = state.replace(admm_duals=local_duals)
        new_state, metrics = inner(local_state, images, labels)
        new_duals = {
            k: ADMMSiteState(v.alter_d[None], v.gamma[None])
            for k, v in new_state.admm_duals.items()
        }
        return new_state.replace(admm_duals=new_duals), metrics

    def spec_for_state(state):
        return TrainState(
            step=P(), params=jax.tree.map(lambda _: P(), state.params),
            batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
            opt_state=jax.tree.map(lambda _: P(), state.opt_state),
            admm_duals=jax.tree.map(lambda _: P(data_axis), state.admm_duals),
            tx=state.tx,
        )

    @partial(jax.jit, static_argnums=())
    def step(state, images, labels):
        in_specs = (spec_for_state(state), P(data_axis), P(data_axis))
        out_specs = (spec_for_state(state), P())
        f = jax.shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        return f(state, images, labels)

    return step
