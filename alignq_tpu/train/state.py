"""Functional train state: params + batch stats + optimizer + ADMM duals.

Replaces the reference's mutable module attributes and twin optimizers
(main.py:85-121, cdf_alignment_admm/resnet-20-cifar-10/main.py:86-92): the
ADMM duals are a pytree in the state, updated by closed-form assignment in
the train step — not a second Optimizer object.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from alignq_tpu.admm.state import ADMMSiteState, init_site
from alignq_tpu.optim.correction import build_correction_mask
from alignq_tpu.optim.factory import alignq_sgd
from alignq_tpu.optim.schedules import multistep_schedule
from alignq_tpu.train.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    admm_duals: Dict[str, ADMMSiteState]
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt
        )


def flatten_site_names(tree: Any) -> Dict[str, jax.Array]:
    """Flatten a sowed 'admm_d' collection into {path_string: D}.

    sow() stores tuples; each site sows exactly once per forward."""
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        keys = []
        for p in path:
            k = getattr(p, "key", getattr(p, "name", None))
            if k is None:
                k = str(getattr(p, "idx", p))
            keys.append(str(k))
        # drop sow's tuple indices (pure digits); the 'd' leaf name stays
        keys = [k for k in keys if not k.isdigit()]
        flat["/".join(keys)] = leaf
    return flat


def create_train_state(
    rng: jax.Array,
    model,
    cfg: TrainConfig,
    input_shape=(1, 32, 32, 3),
    steps_per_epoch: int = 391,
) -> TrainState:
    """Initialize params/batch-stats/duals/optimizer for a model."""
    p_rng, d_rng, x_rng = jax.random.split(rng, 3)
    # default float dtype (f32 normally, f64 under enable_x64) so init-time
    # conv dtypes agree with the initializers' default
    dummy = jax.random.normal(x_rng, input_shape)
    variables = model.init(p_rng, dummy, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    admm_duals: Dict[str, ADMMSiteState] = {}
    if cfg.admm:
        # discover the ADMM sites by tracing one corr-collecting forward at
        # the train batch size (D is train_batch x train_batch,
        # reference model/resnet.py:43-49)
        dummy_b = jnp.zeros((cfg.train_batch_size,) + tuple(input_shape[1:]))
        _, site_vars = jax.eval_shape(
            lambda v, x: model.apply(
                v, x, train=True, compute_corr=True,
                mutable=["admm_d", "batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            ),
            {"params": params, "batch_stats": batch_stats},
            dummy_b,
        )
        sites = flatten_site_names(site_vars["admm_d"])
        keys = jax.random.split(d_rng, max(len(sites), 1))
        for key, name in zip(keys, sorted(sites)):
            admm_duals[name] = init_site(key, cfg.train_batch_size)

    schedule = multistep_schedule(
        cfg.lr, cfg.lr_decay_steps, cfg.lr_gamma, steps_per_epoch,
        warmup_epochs=cfg.warmup_epochs,
    )
    mask = build_correction_mask(params, exclude=tuple(cfg.correction_exclude))
    tx = alignq_sgd(
        schedule,
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        w_bit=cfg.bitW,
        lam=cfg.lam,
        lam2=cfg.lam2,
        correction_mask=mask,
        use_correction=(cfg.method == "ours" and cfg.use_correction),
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        admm_duals=admm_duals,
        tx=tx,
    )
