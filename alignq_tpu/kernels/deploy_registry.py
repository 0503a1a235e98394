"""Deploy-family registry: artifact meta -> (template, forward, input shape).

VERDICT r4 item 4: `serve.engine_from_artifact` previously hard-coded
{resnet20, resnet56}; every other family's frozen artifact was unservable
even though its INT graph existed. This registry is the serving analog of
`models/registry.py` (training dispatch ≙ the reference's import_module
arch switch, cdf_alignment/resnet-20-cifar-10/main.py:50-59) for the
deployment side — the reference's per-project `main.py test()` paths
(e.g. cdf_alignment/dense-cifar-10/main.py:341-377) cover every model, so
the framework's artifact serving does too.

Contract per family:
- `template(meta)` builds a qparams pytree with the same TREE STRUCTURE as
  the exported artifact (kernels/artifact.py `load_int8_artifact` takes
  leaves from the npz, so leaf shapes/values in the template are
  irrelevant — only the treedef and key paths matter). Structure-affecting
  export options therefore live in the artifact meta: `stage_int8`
  (DenseNet buffer scales), `arch` (BasicBlock vs Bottleneck layer dicts),
  `bottle_neck` (DSAN's optional bottleneck head).
- `forward(meta)` returns `fwd(params, x) -> logits` (single array — DA
  families serve CLASS logits; domain/adversarial heads are training-side
  diagnostics).
- `input_shape(meta)` is the engine's fixed request shape.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _meta_int(meta: Dict[str, Any], key: str, default: int) -> int:
    return int(np.asarray(meta[key])) if key in meta else default


def _meta_str(meta: Dict[str, Any], key: str, default: str) -> str:
    return str(np.asarray(meta[key])) if key in meta else default


def _act_kwargs(meta: Dict[str, Any]) -> Dict[str, Any]:
    from alignq_tpu.kernels.artifact import forward_kwargs_from_meta

    return forward_kwargs_from_meta(meta)


def _fresh_variables(model, input_shape, *extra_args):
    x = jnp.zeros((1, *input_shape), jnp.float32)
    return model.init(jax.random.PRNGKey(0), x, *extra_args, train=False)


@dataclasses.dataclass(frozen=True)
class DeployFamily:
    name: str
    template: Callable[[Dict[str, Any]], Any]
    forward: Callable[[Dict[str, Any]], Callable]
    input_shape: Callable[[Dict[str, Any]], Tuple[int, ...]]
    supports_packed_int4: bool = False


# ---------------------------------------------------------------- CIFAR nets


def _preact_template(builder_name: str):
    def template(meta):
        from alignq_tpu import models
        from alignq_tpu.kernels.infer import convert_preact_resnet

        build = getattr(models, builder_name)
        model = build(
            bitW=_meta_int(meta, "weight_bits", 8),
            abitW=_meta_int(meta, "act_bits", 8), method="ours",
        )
        v = _fresh_variables(model, (32, 32, 3))
        return convert_preact_resnet(
            v["params"], v["batch_stats"],
            weight_bits=_meta_int(meta, "weight_bits", 8),
            act_bits=_meta_int(meta, "act_bits", 8),
        )

    return template


def _preact_forward(meta):
    from alignq_tpu.kernels.infer import resnet20_int8_forward

    kw = _act_kwargs(meta)
    if bool(_meta_int(meta, "use_stage_kernel", 0)):
        kw["use_stage_kernel"] = True  # pairs with the poly grid (export gate)
    return functools.partial(resnet20_int8_forward, **kw)


def _densenet_template(meta):
    from alignq_tpu.kernels.infer_densenet import convert_densenet40
    from alignq_tpu.models import densenet_40_quant

    stage_int8 = bool(_meta_int(meta, "stage_int8", 0))
    model = densenet_40_quant(
        bitW=_meta_int(meta, "weight_bits", 8),
        abitW=_meta_int(meta, "act_bits", 8), method="ours",
        **({"variant": "int8", "deploy_exact": True, "stage_int8": True}
           if stage_int8 else {}),
    )
    v = _fresh_variables(model, (32, 32, 3))
    return convert_densenet40(
        v["params"], v["batch_stats"],
        weight_bits=_meta_int(meta, "weight_bits", 8),
        act_bits=_meta_int(meta, "act_bits", 8), stage_int8=stage_int8,
    )


def _densenet_forward(meta):
    from alignq_tpu.kernels.infer_densenet import densenet40_int8_forward

    kw = _act_kwargs(meta)
    kw.pop("stream", None)  # PreActResNet-only knob
    if bool(_meta_int(meta, "stage_int8", 0)):
        kw["stage_int8"] = True
    return functools.partial(densenet40_int8_forward, **kw)


def _mobilenet_template(meta):
    from alignq_tpu.kernels.infer_mobilenet import convert_mobilenetv2
    from alignq_tpu.models import mobile_v2

    model = mobile_v2(
        bitW=_meta_int(meta, "weight_bits", 8),
        abitW=_meta_int(meta, "act_bits", 8), method="ours",
    )
    v = _fresh_variables(model, (32, 32, 3))
    return convert_mobilenetv2(
        v["params"], v["batch_stats"],
        weight_bits=_meta_int(meta, "weight_bits", 8),
        act_bits=_meta_int(meta, "act_bits", 8),
    )


def _mobilenet_forward(meta):
    from alignq_tpu.kernels.infer_mobilenet import mobilenetv2_int8_forward

    kw = _act_kwargs(meta)
    kw.pop("stream", None)
    return functools.partial(mobilenetv2_int8_forward, **kw)


# ------------------------------------------------------------- ImageNet nets


def _imagenet_builder(arch: str):
    from alignq_tpu import models

    return {
        "resnet18": models.resnet18_quant,
        "resnet34": models.resnet34_quant,
        "resnet50": models.resnet50_quant,
    }[arch]


def _imagenet_template(meta):
    from alignq_tpu.kernels.infer_resnet_imagenet import convert_resnet_imagenet

    arch = _meta_str(meta, "arch", _meta_str(meta, "model", "resnet50"))
    model = _imagenet_builder(arch)(
        bitW=_meta_int(meta, "weight_bits", 8),
        abitW=_meta_int(meta, "act_bits", 8), method="ours",
    )
    # any spatial size works for structure; small keeps init cheap
    v = _fresh_variables(model, (64, 64, 3))
    return convert_resnet_imagenet(
        v["params"], v["batch_stats"],
        weight_bits=_meta_int(meta, "weight_bits", 8),
        act_bits=_meta_int(meta, "act_bits", 8),
    )


def _imagenet_forward(meta):
    from alignq_tpu.kernels.infer_resnet_imagenet import (
        resnet_imagenet_int8_forward,
    )

    kw = _act_kwargs(meta)
    kw.pop("stream", None)
    return functools.partial(resnet_imagenet_int8_forward, **kw)


def _imagenet_shape(meta):
    s = _meta_int(meta, "image_size", 224)
    return (s, s, 3)


# ------------------------------------------------------------------ DA nets
# Office-family DA artifacts store {"trunk": <int8 qparams>, "heads": <f32>}
# (tools/export_da_int8.py --save); serving returns CLASS logits.


def _da_model(meta, task: str):
    arch = _meta_str(meta, "arch", "resnet50")
    bits_w = _meta_int(meta, "weight_bits", 8)
    bits_a = _meta_int(meta, "act_bits", 8)
    n_cls = _meta_int(meta, "num_classes", 31)
    if task == "dann":
        from alignq_tpu.models import DANN

        return DANN(arch=arch, num_classes=n_cls, w_bit=bits_w, a_bit=bits_a,
                    method="ours", variant="int8")
    if task == "dsan":
        from alignq_tpu.models import DSAN

        return DSAN(arch=arch, num_classes=n_cls,
                    bottle_neck=bool(_meta_int(meta, "bottle_neck", 1)),
                    w_bit=bits_w, a_bit=bits_a, method="ours", variant="int8")
    from alignq_tpu.models.mdd import MDDNet

    return MDDNet(arch=arch, num_classes=n_cls, w_bit=bits_w, a_bit=bits_a,
                  method="ours", variant="int8")


def _da_template(task: str):
    def template(meta):
        from alignq_tpu.kernels import infer_resnet_imagenet as kir

        convert = {"dann": kir.convert_dann, "dsan": kir.convert_dsan,
                   "mdd": kir.convert_mdd}[task]
        model = _da_model(meta, task)
        s = _meta_int(meta, "image_size", 64)
        x = jnp.zeros((1, s, s, 3), jnp.float32)
        extra = () if task == "dsan" else (0.0,)
        v = model.init(jax.random.PRNGKey(0), x, *extra, train=False)
        qp, heads = convert(
            v["params"], v["batch_stats"],
            weight_bits=_meta_int(meta, "weight_bits", 8),
            act_bits=_meta_int(meta, "act_bits", 8),
        )
        return {"trunk": qp, "heads": heads}

    return template


def _da_forward(task: str):
    def forward(meta):
        from alignq_tpu.kernels import infer_resnet_imagenet as kir

        kw = _act_kwargs(meta)
        kw.pop("stream", None)
        if task == "dann":
            def fwd(params, x):
                cls, _ = kir.dann_int8_forward(
                    params["trunk"], params["heads"], x, **kw
                )
                return cls

            return fwd
        raw = {"dsan": kir.dsan_int8_forward, "mdd": kir.mdd_int8_forward}[task]
        return lambda params, x: raw(params["trunk"], params["heads"], x, **kw)

    return forward


def _da_shape(meta):
    s = _meta_int(meta, "image_size", 64)
    return (s, s, 3)


def _digit_template(meta):
    from alignq_tpu.kernels.infer_digit import convert_mnist_dann
    from alignq_tpu.models import mnist_model_quant

    model = mnist_model_quant(
        bitW=_meta_int(meta, "weight_bits", 8),
        abitW=_meta_int(meta, "act_bits", 8), method="ours", variant="int8",
    )
    s = _meta_int(meta, "img_size", 28)
    x = jnp.zeros((1, s, s, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, 0.0, train=False)
    return convert_mnist_dann(
        v["params"], v["batch_stats"],
        weight_bits=_meta_int(meta, "weight_bits", 8),
        act_bits=_meta_int(meta, "act_bits", 8),
    )


def _digit_forward(meta):
    from alignq_tpu.kernels.infer_digit import mnist_dann_int8_forward

    kw = _act_kwargs(meta)
    kw.pop("stream", None)

    def fwd(params, x):
        cls, _ = mnist_dann_int8_forward(params, x, **kw)
        return cls

    return fwd


def _digit_shape(meta):
    s = _meta_int(meta, "img_size", 28)
    return (s, s, 3)


DEPLOY_FAMILIES: Dict[str, DeployFamily] = {
    "resnet20": DeployFamily(
        "resnet20", _preact_template("resnet20_quant"), _preact_forward,
        lambda meta: (32, 32, 3), supports_packed_int4=True,
    ),
    "resnet56": DeployFamily(
        "resnet56", _preact_template("resnet56_quant"), _preact_forward,
        lambda meta: (32, 32, 3), supports_packed_int4=True,
    ),
    "densenet40": DeployFamily(
        "densenet40", _densenet_template, _densenet_forward,
        lambda meta: (32, 32, 3),
    ),
    "mobilenetv2": DeployFamily(
        "mobilenetv2", _mobilenet_template, _mobilenet_forward,
        lambda meta: (32, 32, 3),
    ),
    "resnet18": DeployFamily(
        "resnet18", _imagenet_template, _imagenet_forward, _imagenet_shape,
    ),
    "resnet34": DeployFamily(
        "resnet34", _imagenet_template, _imagenet_forward, _imagenet_shape,
    ),
    "resnet50": DeployFamily(
        "resnet50", _imagenet_template, _imagenet_forward, _imagenet_shape,
    ),
    "dann": DeployFamily("dann", _da_template("dann"), _da_forward("dann"),
                         _da_shape),
    "dsan": DeployFamily("dsan", _da_template("dsan"), _da_forward("dsan"),
                         _da_shape),
    "mdd": DeployFamily("mdd", _da_template("mdd"), _da_forward("mdd"),
                        _da_shape),
    "digit_dann": DeployFamily("digit_dann", _digit_template, _digit_forward,
                               _digit_shape),
}
