"""Domain-adaptation training: DANN, DSAN, digit-DANN.

Reference drivers (SURVEY.md section 3.4):
- DANN: /root/reference/cdf_alignment_admm/dann_office/main.py:296-460 —
  GRL ramp alpha(p) = 2/(1+e^{-10p}+1e-6)-1 (:351-352), loss = src class CE +
  src domain CE + tgt domain CE (+ trans losses) (:384), per-epoch DANN LR
  lr/(1+10p)^0.75 with heads at 10x feature LR (:320-338).
- DSAN: /root/reference/cdf_alignment/dsan_office/main.py:395-400 —
  loss = cls CE + param * lambda(p) * LMMD, lambda = 2/(1+e^{-10 ep/E})-1.
- digit: /root/reference/cdf_alignment/dann_digit/main.py — plain torch SGD
  (no PDF correction, :108), per-iteration LR schedule (:334-338).

All steps are single jitted programs; alpha/lambda ramps enter as traced
scalars so there is no per-epoch recompilation (the reference rebuilds its
optimizer every epoch, main.py:325-338 — the schedule here is the continuous
per-step equivalent).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from alignq_tpu.admm.lmmd import lmmd
from alignq_tpu.admm.loss import ADMMConfig, admm_loss
from alignq_tpu.admm.state import dual_update
from alignq_tpu.optim.correction import build_correction_mask, scale_by_alignq_correction
from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.state import TrainState, flatten_site_names
from alignq_tpu.train.steps import cross_entropy_loss
from alignq_tpu.utils.logging_utils import dump_config, get_logger
from alignq_tpu.utils.meters import AverageMeter


@dataclasses.dataclass(frozen=True)
class DAConfig(TrainConfig):
    """DA flags (reference utils/options_office.py:30-101, digit options)."""

    src_data: str = "dslr"
    tgt_data: str = "webcam"
    train_split: float = 0.8
    src_only_flag: bool = False
    alpha: float = 10.0  # GRL / LR ramp coefficient
    param: float = 0.3  # DSAN LMMD weight (dsan options_office.py:64)
    bottle_neck: bool = True
    img_size: int = 28  # digit models
    num_classes: int = 31
    # the digit driver uses plain torch SGD — no PDF correction
    # (dann_digit/main.py:108); office drivers use the corrected SGD
    use_correction: bool = True
    # 'align' = FP32 CDF-only ablation stage; the reference DSAN default
    # (dsan_office/utils/options_office.py:26 STAGE='align'). Only observable
    # at abitW==32 (nn/layers.py QuantAct.stage).
    stage: str = "quant"
    # MDD source-margin weight (models/mdd.py mdd_loss; reference
    # dann_office/model/resnet.py:419 srcweight — dead code there, usable
    # here via fit_mdd)
    srcweight: float = 3.0
    lr: float = 1e-3
    weight_decay: float = 5e-4
    head_lr_mult: float = 10.0


def grl_alpha(p) -> jax.Array:
    """alpha(p) = 2/(1+e^{-10p}+1e-6) - 1 (dann_office/main.py:351-352)."""
    return 2.0 / (1.0 + jnp.exp(-10.0 * p) + 1e-6) - 1.0


def dann_lr(base_lr: float, p, alpha: float = 10.0, beta: float = 0.75):
    """lr(p) = base/(1+alpha*p)^beta (dann_office/main.py:320)."""
    return base_lr / (1.0 + alpha * p) ** beta


def make_da_optimizer(cfg: DAConfig, params, total_steps: int, head_prefixes: Sequence[str]):
    """SGD with the DANN LR schedule; heads at head_lr_mult x the feature LR
    (reference param groups, dann_office/main.py:325-338), plus the AlignQ
    correction on feature conv kernels for method='ours'."""

    def schedule(step):
        p = step / max(total_steps, 1)
        return dann_lr(cfg.lr / cfg.head_lr_mult, p, cfg.alpha)

    def lr_mult_mask(params):
        def rule(path, leaf):
            top = str(getattr(path[0], "key", ""))
            return cfg.head_lr_mult if top in head_prefixes else 1.0

        return jax.tree_util.tree_map_with_path(rule, params)

    mults = lr_mult_mask(params)
    parts = [optax.add_decayed_weights(cfg.weight_decay)]
    if cfg.momentum:
        parts.append(optax.trace(decay=cfg.momentum))
    if cfg.method == "ours" and cfg.bitW < 32 and cfg.use_correction:
        mask = build_correction_mask(params, exclude=tuple(cfg.correction_exclude))
        parts.append(
            scale_by_alignq_correction(cfg.bitW, cfg.lam, cfg.lam2, mask=mask)
        )
    # per-leaf LR multiplier then the shared schedule
    parts.append(
        optax.GradientTransformation(
            lambda params: optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree.map(lambda u, m: u * m, updates, mults),
                state,
            ),
        )
    )
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def _build_da_placement(cfg: TrainConfig):
    """Data-parallel placement for the DA loops (VERDICT r3 item 4).

    Returns None for a 1-device mesh, else a `place((xs, ys, xt)) -> tuple`
    that shards every array's batch dim over the mesh's data axis (and
    routes through the per-process multihost path when jax.distributed is
    active). The jitted DA steps are pure functions of their inputs, so
    GSPMD alone distributes them: gradients psum where the replicated
    params meet sharded activations, BN batch stats reduce over the GLOBAL
    batch, and the batch-coupled losses keep exact reference semantics —
    the ADMM corr matrices and the LMMD kernel matrices are global-B x
    global-B contractions, so XLA inserts the feature all-gathers
    (dist/corr.py 'gather' mode). That is why corr_mode='local' is
    rejected here: per-shard block-diagonal duals are a classification-
    driver approximation (train/loop.py), and LMMD has the same cross-
    batch coupling with no local variant defined.

    The reference DA drivers are single-GPU
    (dann_office/main.py:296-460); this distribution layer is
    framework-native with no reference twin.
    """
    import math

    if math.prod(cfg.mesh_shape) <= 1:
        return None
    if cfg.corr_mode != "gather":
        raise ValueError(
            "distributed DA training supports corr_mode='gather' only: the "
            "ADMM corr and LMMD losses are global-batch-coupled, and the "
            "per-shard 'local' approximation is classification-driver-only"
        )
    if getattr(cfg, "grad_compression", "f32") != "f32":
        raise ValueError(
            "grad_compression is a shard_map (corr_mode='local') feature; "
            "the DA steps are single GSPMD programs whose gradient "
            "reductions XLA inserts itself — there is no manual pmean to "
            "compress (train/steps.py:95 is the classification-local path)"
        )
    from alignq_tpu.dist import make_mesh, multihost, shard_batch

    mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
    if dict(mesh.shape).get("model", 1) > 1:
        raise ValueError("DA training distributes over the data axis only")
    axis = cfg.mesh_axes[0]
    n_data = mesh.shape[axis]

    def place(batch):
        for x in batch:
            if x.shape[0] % n_data:
                raise ValueError(
                    f"DA batch dim {x.shape[0]} not divisible by data-axis "
                    f"size {n_data}"
                )
        if multihost.active():
            return multihost.place_batch_multihost(batch, mesh, axis)
        return shard_batch(batch, mesh, axis)

    def place_eval(batch):
        """Eval batches go through the same global-array path (mirrors
        loop.py place_eval): under multihost, a jit fed process-LOCAL
        arrays is not one global program — each process would evaluate
        independently and tiny reduction-order deltas break the
        replicated-metric invariant (caught by
        tests/test_multihost.py::test_two_process_fit_dann_matches_single).
        Uneven tail batches replicate instead of sharding."""
        if batch[0].shape[0] % n_data == 0:
            return place(batch)
        if multihost.active():
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(rep, x),
                batch,
            )
        return batch

    return place, place_eval


def _da_observability(cfg: "DAConfig"):
    """Primary-process logger + config dump (ADVICE r4: mirror loop.py's
    multihost guard — in a multi-process DA run only process 0 writes
    config.json/logger.log; secondaries log warnings+ to their own file)."""
    from alignq_tpu.dist import multihost

    primary = multihost.is_primary()
    log_name = "logger.log" if primary else f"logger.p{jax.process_index()}.log"
    logger = get_logger(f"{cfg.job_dir}/{log_name}")
    if primary:
        # args dump =~ reference config.txt (utils/common.py:49-54)
        dump_config(cfg, cfg.job_dir)
    else:
        import logging

        logger.setLevel(logging.WARNING)
    return logger


def _trans_loss_from(ds, duals, admm_cfg):
    total = 0.0
    for name, d in ds.items():
        site = duals[name]
        total = total + admm_loss(d, site.alter_d, site.gamma, admm_cfg)
    return total


def make_dann_train_step(model, cfg: DAConfig):
    """One DANN step over a (source, target) batch pair."""
    admm_cfg = ADMMConfig(cfg.admm_mu, cfg.admm_rho)
    use_admm = cfg.admm

    def loss_fn(params, batch_stats, xs, ys, xt, alpha, duals, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"] + (["admm_d"] if use_admm else [])
        r1, r2 = jax.random.split(rng)
        (src_cls, src_dom), v1 = model.apply(
            variables, xs, alpha, train=True, compute_corr=use_admm,
            mutable=mutable, rngs={"dropout": r1},
        )
        (_, tgt_dom), v2 = model.apply(
            {"params": params, "batch_stats": v1["batch_stats"]},
            xt, alpha, train=True, compute_corr=use_admm, mutable=mutable,
            rngs={"dropout": r2},
        )
        src_class_loss = cross_entropy_loss(src_cls, ys)
        src_dom_loss = cross_entropy_loss(
            src_dom, jnp.zeros(xs.shape[0], jnp.int32)
        )
        tgt_dom_loss = cross_entropy_loss(
            tgt_dom, jnp.ones(xt.shape[0], jnp.int32)
        )
        trans = 0.0
        ds = {}
        if use_admm:
            ds_src = flatten_site_names(v1.get("admm_d", {}))
            ds_tgt = flatten_site_names(v2.get("admm_d", {}))
            trans = _trans_loss_from(ds_src, duals, admm_cfg) + _trans_loss_from(
                ds_tgt, duals, admm_cfg
            )
            # duals are updated from the SOURCE-pass D. Reference delta
            # (SURVEY.md 2.4.8, intended semantics): the committed driver
            # harvests block.admm0.D — the attribute written by the LAST
            # forward, i.e. the TARGET pass — and additionally SGD-steps
            # gamma before the dual assignment (2.4.9, duals-as-params
            # artifact). Both committed behaviors are verified against the
            # actual reference code by tools/reference_parity_dann.py.
            ds = ds_src
        if cfg.src_only_flag:
            loss = src_class_loss
        else:
            loss = src_class_loss + src_dom_loss + tgt_dom_loss + trans
        aux = {
            "src_class": src_class_loss,
            "src_domain": src_dom_loss,
            "tgt_domain": tgt_dom_loss,
            "trans": trans,
            "logits": src_cls,
        }
        return loss, (aux, v2["batch_stats"], ds)

    def train_step(state: TrainState, xs, ys, xt, alpha):
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)
        (loss, (aux, new_bs, ds)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, xs, ys, xt, alpha, state.admm_duals, rng)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        if use_admm:
            new_duals = {
                name: dual_update(state.admm_duals[name], d, admm_cfg)
                for name, d in ds.items()
            }
            new_state = new_state.replace(admm_duals=new_duals)
        acc = jnp.mean(jnp.argmax(aux["logits"], -1) == ys)
        metrics = {
            "loss": loss, "src_class": aux["src_class"],
            "src_domain": aux["src_domain"], "tgt_domain": aux["tgt_domain"],
            "trans": aux["trans"], "accuracy": acc,
        }
        return new_state, metrics

    return train_step


def make_dann_eval_step(model, cfg: DAConfig):
    """Dual eval: class + domain accuracy (dann_office/main.py:506-557)."""

    def eval_step(state: TrainState, x, y, domain_label):
        cls_out, dom_out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, 0.0, train=False,
        )
        return {
            "loss": cross_entropy_loss(cls_out, y),
            "top1": jnp.mean(jnp.argmax(cls_out, -1) == y),
            "top5": jnp.mean(
                jnp.any(
                    jax.lax.top_k(cls_out, min(5, cls_out.shape[-1]))[1]
                    == y[:, None],
                    axis=-1,
                )
            ),
            "domain_acc": jnp.mean(jnp.argmax(dom_out, -1) == domain_label),
        }

    return eval_step


def make_dsan_train_step(model, cfg: DAConfig):
    """One DSAN step (dsan_office/main.py:376-400)."""
    admm_cfg = ADMMConfig(cfg.admm_mu, cfg.admm_rho)
    use_admm = cfg.admm

    def loss_fn(params, batch_stats, xs, ys, xt, lambd, duals, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"] + (["admm_d"] if use_admm else [])
        (s_pred, s_feat, t_pred, t_feat), v = model.apply(
            variables, xs, xt, train=True, compute_corr=use_admm,
            mutable=mutable, rngs={"dropout": rng},
        )
        cls = cross_entropy_loss(s_pred, ys)
        loss_lmmd = lmmd(
            s_feat, t_feat, ys, jax.nn.softmax(t_pred, -1), cfg.num_classes
        )
        trans = 0.0
        ds = {}
        if use_admm:
            ds = flatten_site_names(v.get("admm_d", {}))
            trans = _trans_loss_from(ds, duals, admm_cfg)
        loss = cls + cfg.param * lambd * loss_lmmd + trans
        return loss, ({"cls": cls, "lmmd": loss_lmmd, "trans": trans, "logits": s_pred}, v["batch_stats"], ds)

    def train_step(state: TrainState, xs, ys, xt, lambd):
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)
        (loss, (aux, new_bs, ds)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, xs, ys, xt, lambd, state.admm_duals, rng
        )
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        if use_admm:
            new_duals = {
                name: dual_update(state.admm_duals[name], d, admm_cfg)
                for name, d in ds.items()
            }
            new_state = new_state.replace(admm_duals=new_duals)
        acc = jnp.mean(jnp.argmax(aux["logits"], -1) == ys)
        return new_state, {
            "loss": loss, "cls": aux["cls"], "lmmd": aux["lmmd"],
            "trans": aux["trans"], "accuracy": acc,
        }

    return train_step


def fit_dsan(
    cfg: DAConfig,
    loaders: dict,
    model,
    max_steps: Optional[int] = None,
) -> dict:
    """DSAN loop (dsan_office/main.py:333-420): zipped loaders with the
    batch-size-equalization handled by drop-remainder static batches; LMMD
    weight ramp lambda = 2/(1+e^{-10 ep/E}) - 1 (main.py:395-397)."""
    import math

    from alignq_tpu.train.state import create_train_state

    logger = _da_observability(cfg)
    steps_per_epoch = min(len(loaders["src_train"]), len(loaders["tgt_train"]))
    total_steps = steps_per_epoch * cfg.num_epochs

    sample_shape = (1, *loaders["src_train"].x.shape[1:])
    state = create_train_state(
        jax.random.PRNGKey(cfg.seed), model, cfg, input_shape=sample_shape,
        steps_per_epoch=steps_per_epoch,
    )
    tx = make_da_optimizer(
        cfg, state.params, total_steps, head_prefixes=("cls_fc", "bottle")
    )
    state = state.replace(tx=tx, opt_state=tx.init(state.params))

    train_step = jax.jit(make_dsan_train_step(model, cfg), donate_argnums=(0,))
    placement = _build_da_placement(cfg)
    place, place_eval = placement if placement is not None else (None, None)

    @jax.jit
    def eval_step(state, x, y):
        pred = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False,
        )
        return {
            "top1": jnp.mean(jnp.argmax(pred, -1) == y),
        }

    best = {"tgt_top1": 0.0}
    step = 0
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        lambd = 2.0 / (1.0 + math.exp(-10.0 * epoch / max(cfg.num_epochs, 1))) - 1.0
        lm = AverageMeter()
        for (xs, ys), (xt, _) in zip(loaders["src_train"], loaders["tgt_train"]):
            batch = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt))
            if place is not None:
                batch = place(batch)
            state, m = train_step(state, *batch, lambd)
            lm.update(float(m["loss"]))
            step += 1
            if max_steps is not None and step >= max_steps:
                break
        am = AverageMeter()
        for x, y in loaders["tgt_test"]:
            eb = (jnp.asarray(x), jnp.asarray(y))
            if place_eval is not None:
                eb = place_eval(eb)
            em = eval_step(state, *eb)
            am.update(float(em["top1"]) * 100, len(y))
        best["tgt_top1"] = max(best["tgt_top1"], am.avg)
        logger.info(
            f"DSAN[{epoch}] loss {lm.avg:.4f} lambda {lambd:.3f} "
            f"tgt_acc {am.avg:.2f} (best {best['tgt_top1']:.2f}) "
            f"[{time.time()-t0:.1f}s]"
        )
        if max_steps is not None and step >= max_steps:
            break
    return {"best_tgt_top1": best["tgt_top1"], "state": state}


def fit_dann(
    cfg: DAConfig,
    loaders: dict,
    model,
    max_steps: Optional[int] = None,
) -> dict:
    """DANN training loop over zipped source/target loaders
    (dann_office/main.py:344-347).

    Reference delta (SURVEY.md 2.4 policy — intended semantics, documented):
    the reference sizes its ramps with max(len(src), len(tgt)) steps/epoch
    (dann_office/main.py:344-345) but zip() stops at the MIN, so with uneven
    loaders its GRL alpha and LR ramps never reach their terminal values.
    Here total_steps = min(...) * epochs — the number of steps actually
    executed — so p reaches 1.0 and the schedules complete as intended.
    fit_dsan/fit_mdd already use min for the same reason.
    """
    from alignq_tpu.train.state import create_train_state

    logger = _da_observability(cfg)
    steps_per_epoch = min(len(loaders["src_train"]), len(loaders["tgt_train"]))
    total_steps = steps_per_epoch * cfg.num_epochs

    sample_shape = (1, *loaders["src_train"].x.shape[1:])
    rng = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(
        rng, model, cfg, input_shape=sample_shape, steps_per_epoch=steps_per_epoch
    )
    # swap in the DA optimizer (head LR groups + DANN schedule)
    tx = make_da_optimizer(
        cfg, state.params, total_steps,
        head_prefixes=("class_classifier", "domain_classifier", "classifier", "discriminator"),
    )
    state = state.replace(tx=tx, opt_state=tx.init(state.params))

    train_step = jax.jit(make_dann_train_step(model, cfg), donate_argnums=(0,))
    eval_step = jax.jit(make_dann_eval_step(model, cfg))
    placement = _build_da_placement(cfg)
    place, place_eval = placement if placement is not None else (None, None)

    best = {"tgt_top1": 0.0}
    step = 0
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        meters = {k: AverageMeter() for k in ("loss", "accuracy")}
        for (xs, ys), (xt, _) in zip(loaders["src_train"], loaders["tgt_train"]):
            p = step / max(total_steps, 1)
            alpha = float(grl_alpha(p))
            batch = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt))
            if place is not None:
                batch = place(batch)
            state, m = train_step(state, *batch, alpha)
            for k in meters:
                meters[k].update(float(m[k]))
            step += 1
            if max_steps is not None and step >= max_steps:
                break

        # dual test loops: target & source (dann_office/main.py:506-557)
        accs = {}
        for split, dom in (("tgt_test", 1), ("src_test", 0)):
            am = AverageMeter()
            for x, y in loaders[split]:
                eb = (jnp.asarray(x), jnp.asarray(y))
                if place_eval is not None:
                    eb = place_eval(eb)
                em = eval_step(state, *eb, dom)
                am.update(float(em["top1"]) * 100, len(y))
            accs[split] = am.avg
        best["tgt_top1"] = max(best["tgt_top1"], accs["tgt_test"])
        logger.info(
            f"DANN[{epoch}] loss {meters['loss'].avg:.4f} "
            f"src_acc {accs['src_test']:.2f} tgt_acc {accs['tgt_test']:.2f} "
            f"(best {best['tgt_top1']:.2f}) [{time.time()-t0:.1f}s]"
        )
        if max_steps is not None and step >= max_steps:
            break
    return {"best_tgt_top1": best["tgt_top1"], "state": state}


def make_mdd_train_step(model, cfg: DAConfig):
    """One MDD step over a (source, target) batch pair.

    The reference's MDD head is dead code (SURVEY.md C16 —
    dann_office/model/resnet.py:345-457 is never constructed by a main.py),
    so there is no reference driver to mirror; this follows the framework's
    DANN two-pass convention (source pass then target pass, BN stats threaded
    through both, ADMM duals updated from the source-pass D) and assembles
    the canonical MDD objective (models/mdd.py mdd_loss) over the
    concatenated classifier outputs.
    """
    from alignq_tpu.models.mdd import mdd_loss

    admm_cfg = ADMMConfig(cfg.admm_mu, cfg.admm_rho)
    use_admm = cfg.admm

    def loss_fn(params, batch_stats, xs, ys, xt, coeff, duals, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        mutable = ["batch_stats"] + (["admm_d"] if use_admm else [])
        r1, r2 = jax.random.split(rng)
        (_, src_out, _, src_adv), v1 = model.apply(
            variables, xs, coeff, train=True, compute_corr=use_admm,
            mutable=mutable, rngs={"dropout": r1},
        )
        (_, tgt_out, _, tgt_adv), v2 = model.apply(
            {"params": params, "batch_stats": v1["batch_stats"]},
            xt, coeff, train=True, compute_corr=use_admm, mutable=mutable,
            rngs={"dropout": r2},
        )
        outputs = jnp.concatenate([src_out, tgt_out], axis=0)
        outputs_adv = jnp.concatenate([src_adv, tgt_adv], axis=0)
        loss = mdd_loss(outputs, outputs_adv, ys, srcweight=cfg.srcweight)
        trans = 0.0
        ds = {}
        if use_admm:
            ds_src = flatten_site_names(v1.get("admm_d", {}))
            ds_tgt = flatten_site_names(v2.get("admm_d", {}))
            trans = _trans_loss_from(ds_src, duals, admm_cfg) + _trans_loss_from(
                ds_tgt, duals, admm_cfg
            )
            ds = ds_src
        cls = cross_entropy_loss(src_out, ys)
        aux = {"cls": cls, "trans": trans, "logits": src_out}
        return loss + trans, (aux, v2["batch_stats"], ds)

    def train_step(state: TrainState, xs, ys, xt, coeff):
        rng = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), state.step)
        (loss, (aux, new_bs, ds)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, xs, ys, xt, coeff, state.admm_duals, rng)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bs)
        if use_admm:
            new_duals = {
                name: dual_update(state.admm_duals[name], d, admm_cfg)
                for name, d in ds.items()
            }
            new_state = new_state.replace(admm_duals=new_duals)
        acc = jnp.mean(jnp.argmax(aux["logits"], -1) == ys)
        return new_state, {
            "loss": loss, "cls": aux["cls"], "trans": aux["trans"],
            "accuracy": acc,
        }

    return train_step


def fit_mdd(
    cfg: DAConfig,
    loaders: dict,
    model,
    max_steps: Optional[int] = None,
) -> dict:
    """MDD training loop: zipped source/target loaders, annealed GRL
    coefficient (models/mdd.py mdd_grl_coeff over total steps), DANN LR
    schedule with 10x head groups. No reference driver exists (C16 dead
    code); the loop shape mirrors fit_dann."""
    from alignq_tpu.models.mdd import mdd_grl_coeff
    from alignq_tpu.train.state import create_train_state

    logger = _da_observability(cfg)
    steps_per_epoch = min(len(loaders["src_train"]), len(loaders["tgt_train"]))
    total_steps = steps_per_epoch * cfg.num_epochs

    sample_shape = (1, *loaders["src_train"].x.shape[1:])
    state = create_train_state(
        jax.random.PRNGKey(cfg.seed), model, cfg, input_shape=sample_shape,
        steps_per_epoch=steps_per_epoch,
    )
    tx = make_da_optimizer(
        cfg, state.params, total_steps,
        head_prefixes=("bottleneck_fc", "bottleneck_bn", "classifier",
                       "classifier_adv"),
    )
    state = state.replace(tx=tx, opt_state=tx.init(state.params))

    train_step = jax.jit(make_mdd_train_step(model, cfg), donate_argnums=(0,))
    placement = _build_da_placement(cfg)
    place, place_eval = placement if placement is not None else (None, None)

    @jax.jit
    def eval_step(state, x, y):
        _, outputs, _, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, 0.0, train=False,
        )
        return {"top1": jnp.mean(jnp.argmax(outputs, -1) == y)}

    best = {"tgt_top1": 0.0}
    step = 0
    for epoch in range(cfg.num_epochs):
        t0 = time.time()
        meters = {k: AverageMeter() for k in ("loss", "accuracy")}
        for (xs, ys), (xt, _) in zip(loaders["src_train"], loaders["tgt_train"]):
            coeff = float(mdd_grl_coeff(step, max_iter=max(total_steps, 1)))
            batch = (jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(xt))
            if place is not None:
                batch = place(batch)
            state, m = train_step(state, *batch, coeff)
            for k in meters:
                meters[k].update(float(m[k]))
            step += 1
            if max_steps is not None and step >= max_steps:
                break
        am = AverageMeter()
        for x, y in loaders["tgt_test"]:
            eb = (jnp.asarray(x), jnp.asarray(y))
            if place_eval is not None:
                eb = place_eval(eb)
            em = eval_step(state, *eb)
            am.update(float(em["top1"]) * 100, len(y))
        best["tgt_top1"] = max(best["tgt_top1"], am.avg)
        logger.info(
            f"MDD[{epoch}] loss {meters['loss'].avg:.4f} "
            f"src_acc {100*meters['accuracy'].avg:.2f} tgt_acc {am.avg:.2f} "
            f"(best {best['tgt_top1']:.2f}) [{time.time()-t0:.1f}s]"
        )
        if max_steps is not None and step >= max_steps:
            break
    return {"best_tgt_top1": best["tgt_top1"], "state": state}
