"""DenseNet-40 and MobileNet-V2 model families."""

import jax
import numpy as np

from alignq_tpu.models import densenet_40_quant, mobile_v2

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration (pyproject markers)


class TestDenseNet40:
    def test_forward_and_structure(self):
        model = densenet_40_quant(bitW=4, abitW=4, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (2, 10)
        params = variables["params"]
        dense_blocks = [k for k in params if k.startswith("dense")]
        assert len(dense_blocks) == 36  # 12 per stage x 3 (depth 40 -> n=12)
        assert "trans1" in params and "trans2" in params
        # final feature width: 24 + 36*12 with compressionRate=1 = 456... but
        # transitions keep channels; check fc input via kernel shape
        assert params["fc"]["kernel"].shape[1] == 10

    def test_admm_sites(self):
        model = densenet_40_quant(bitW=4, abitW=4, method="ours", admm=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        _, aux = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, train=True, compute_corr=True, mutable=["admm_d", "batch_stats"],
        )
        from alignq_tpu.train.state import flatten_site_names
        sites = flatten_site_names(aux["admm_d"])
        assert len(sites) == 39  # 36 dense + 2 transitions + 1 final act_q0


class TestMobileNetV2:
    def test_forward_and_depthwise(self):
        model = mobile_v2(bitW=4, abitW=4, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        logits = model.apply(variables, x, train=False)
        assert logits.shape == (2, 10)
        p = variables["params"]
        # 17 inverted-residual blocks (1+2+3+4+3+3+1, mobilenetV2.py:77-83)
        blocks = [k for k in p if k.startswith("layers_")]
        assert len(blocks) == 17
        # depthwise conv2: kernel input-channel dim == 1 (groups == planes)
        assert p["layers_1"]["conv2"]["kernel"].shape[2] == 1
        # quantized 1x1 shortcut exists for stride-1 blocks
        assert "shortcut_conv" in p["layers_0"]

    def test_head_width(self):
        model = mobile_v2(bitW=8, abitW=8, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        assert variables["params"]["linear"]["kernel"].shape == (1280, 10)
