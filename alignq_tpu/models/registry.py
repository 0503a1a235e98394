"""Model registry: config -> flax module.

Replaces the reference's import_module arch dispatch
(/root/reference/cdf_alignment/resnet-20-cifar-10/main.py:50-59)."""

from __future__ import annotations

from alignq_tpu.train.config import TrainConfig


def build_model(cfg: TrainConfig):
    from alignq_tpu import models

    name = cfg.target_model
    builders = {
        "resnet20_quant": models.resnet20_quant,
        "resnet56_quant": models.resnet56_quant,
    }
    # registered lazily as families land
    try:
        from alignq_tpu.models import densenet as _dense

        builders["densenet_40_quant"] = _dense.densenet_40_quant
    except ImportError:
        pass
    try:
        from alignq_tpu.models import mobilenetv2 as _mb

        builders["mobile_v2"] = _mb.mobile_v2
    except ImportError:
        pass
    if name not in builders:
        raise ValueError(f"unknown target_model {name!r}; have {sorted(builders)}")
    import jax.numpy as jnp

    kwargs = dict(
        bitW=cfg.bitW,
        abitW=cfg.abitW,
        method=cfg.method,
        admm=cfg.admm,
        variant=cfg.variant,
        act_range=cfg.act_range,
        num_classes=cfg.num_classes,
        cdf_impl=cfg.cdf_impl,
        mxu_dtype=jnp.bfloat16 if cfg.mxu_bf16 else None,
    )
    if cfg.deploy_exact:
        if name not in (
            "resnet20_quant",
            "resnet56_quant",
            "mobile_v2",
            "densenet_40_quant",
        ):
            raise ValueError(
                f"deploy_exact QAT is not implemented for {name!r}"
            )
        kwargs["deploy_exact"] = True
        if getattr(cfg, "stream_int8", False):
            if name not in ("resnet20_quant", "resnet56_quant"):
                raise ValueError(
                    "stream_int8 (int8 residual stream) is a PreActResNet "
                    "deploy option"
                )
            kwargs["stream_int8"] = True
    elif getattr(cfg, "stream_int8", False):
        raise ValueError("stream_int8 requires deploy_exact")
    if getattr(cfg, "stage_int8", False):
        if name != "densenet_40_quant":
            raise ValueError(
                "stage_int8 (int8 stage buffer) is a DenseNet deploy option"
            )
        if not cfg.deploy_exact:
            # the int8-buffer graph also requantizes the image stem input,
            # so the QAT twin needs the deploy_exact stem site
            raise ValueError("stage_int8 requires deploy_exact")
        kwargs["stage_int8"] = True
        kwargs["stage_calib"] = getattr(cfg, "stage_calib", "max")
    return builders[name](**kwargs)
