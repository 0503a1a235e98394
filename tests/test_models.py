"""Model zoo: shapes, ADMM site counts, method-family topologies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.models import resnet20_quant, resnet56_quant
from alignq_tpu.train.state import flatten_site_names


def _init_and_forward(model, shape=(2, 32, 32, 3), **apply_kw):
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    out = model.apply(variables, x, train=False, **apply_kw)
    return variables, out


class TestResNetCifar:
    def test_resnet20_shapes_and_params(self):
        model = resnet20_quant(bitW=8, abitW=8, method="ours")
        variables, logits = _init_and_forward(model)
        assert logits.shape == (2, 10)
        n = sum(x.size for x in jax.tree.leaves(variables["params"]))
        # torch ResNet-20 ~272k params (conv+bn+fc); ours matches topology
        assert 250_000 < n < 300_000

    def test_resnet56_depth(self):
        model = resnet56_quant(bitW=8, abitW=8, method="ours")
        variables, logits = _init_and_forward(model, shape=(1, 32, 32, 3))
        assert logits.shape == (1, 10)
        blocks = [k for k in variables["params"] if k.startswith("layers_")]
        assert len(blocks) == 27  # 9+9+9 (resnet.py:166-167)

    @pytest.mark.parametrize(
        "method", ["ours", "uniform", "dorefa", "lsq", "apot", "llsq", "bwn", "bwnf", "fp"]
    )
    def test_all_method_families_forward(self, method):
        model = resnet20_quant(bitW=4, abitW=4, method=method)
        _, logits = _init_and_forward(model, shape=(2, 16, 16, 3))
        assert logits.shape == (2, 10)
        assert np.isfinite(np.asarray(logits)).all()

    def test_admm_site_count_resnet20(self):
        # reference: stem admm0 + per-block admm0/admm1 + admm_skip on the
        # two stride-2 blocks = 1 + 18 + 2 = 21
        # (cdf_alignment_admm/resnet-56-cifar-10/model/resnet.py:48-49,63,113)
        model = resnet20_quant(bitW=4, abitW=4, method="ours", admm=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=True, compute_corr=True)
        # pass only params/batch_stats: sow APPENDS to an existing admm_d
        # collection, which would double the sites
        _, aux = model.apply(
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
            x, train=True, compute_corr=True,
            mutable=["admm_d", "batch_stats"],
        )
        sites = flatten_site_names(aux["admm_d"])
        assert len(sites) == 21
        for d in sites.values():
            assert d.shape == (4, 4)

    def test_eval_has_no_admm_sites(self):
        model = resnet20_quant(bitW=4, abitW=4, method="ours", admm=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 10)

    def test_block_bits_mixed_precision(self):
        model = resnet20_quant(
            bitW=8, abitW=8, method="ours", block_bits=[2] * 3 + [4] * 3 + [8] * 3
        )
        _, logits = _init_and_forward(model, shape=(1, 16, 16, 3))
        assert np.isfinite(np.asarray(logits)).all()

    def test_train_mode_updates_batch_stats(self):
        model = resnet20_quant(bitW=8, abitW=8, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 3)) * 3 + 1
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        _, updated = model.apply(variables, x, train=True, mutable=["batch_stats"])
        before = jax.tree.leaves(variables["batch_stats"])
        after = jax.tree.leaves(updated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
        )
