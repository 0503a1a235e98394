"""Distributed layer: mesh, shardings, and the multi-chip dry run on the
8-device virtual CPU mesh (SURVEY.md section 4c)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from alignq_tpu.dist import make_mesh, param_shardings, shard_batch

pytestmark = pytest.mark.slow  # compile-heavy integration (pyproject markers)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((4, 2), ("data", "model"))


class TestMesh:
    def test_default_all_data(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == len(jax.devices())

    def test_bad_shape_raises(self):
        with pytest.raises(ValueError):
            make_mesh((3, 5), ("data", "model"))


class TestShardings(object):
    def test_batch_sharded_on_data(self, mesh8):
        x = jnp.zeros((16, 8, 8, 3))
        xs = shard_batch(x, mesh8)
        assert xs.sharding.spec == P("data")

    def test_param_rules(self, mesh8):
        params = {
            "conv": {"kernel": jnp.zeros((3, 3, 16, 32))},
            "odd_conv": {"kernel": jnp.zeros((3, 3, 16, 17))},
            "dense": {"kernel": jnp.zeros((64, 10)), "bias": jnp.zeros((10,))},
        }
        sh = param_shardings(params, mesh8)
        assert sh["conv"]["kernel"].spec == P(None, None, None, "model")
        # 17 not divisible by model=2 -> replicated
        assert sh["odd_conv"]["kernel"].spec == P()
        assert sh["dense"]["kernel"].spec == P(None, "model")
        assert sh["dense"]["bias"].spec == P()


class TestDryrun:
    def test_graft_dryrun_8dev(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_entry_compiles(self):
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 10)
        assert np.isfinite(np.asarray(out)).all()


class TestDPGradEquivalence:
    def test_sharded_step_matches_single_device(self, mesh8):
        """The GSPMD-sharded train step must produce the same loss/grads as
        the single-device run (exact global-batch corr mode)."""
        from alignq_tpu.models import resnet20_quant
        from alignq_tpu.train import TrainConfig, create_train_state, make_train_step

        cfg = TrainConfig(train_batch_size=8, bitW=4, abitW=4, admm=True)
        model = resnet20_quant(bitW=4, abitW=4, method="ours", admm=True)
        state = create_train_state(
            jax.random.PRNGKey(0), model, cfg, input_shape=(1, 16, 16, 3),
            steps_per_epoch=10,
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
        y = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)

        step = jax.jit(make_train_step(model, cfg))
        _, m_single = step(state, x, y)

        xs, ys = shard_batch((x, y), mesh8)
        _, m_shard = step(state, xs, ys)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_shard["loss"]), rtol=1e-4
        )
        np.testing.assert_allclose(
            float(m_single["trans"]), float(m_shard["trans"]), rtol=1e-3, atol=1e-5
        )


class TestLocalCorrMode:
    def test_shardmap_local_duals(self):
        """'local' block-diagonal corr mode: per-shard duals evolve
        independently, metrics replicated (SURVEY.md section 5)."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        from alignq_tpu.dist.corr import (
            create_local_duals,
            make_local_corr_train_step,
        )
        from alignq_tpu.models import resnet20_quant
        from alignq_tpu.train import TrainConfig, create_train_state

        mesh = make_mesh((4,), ("data",))
        cfg = TrainConfig(train_batch_size=16, bitW=4, abitW=4, admm=True)
        model = resnet20_quant(bitW=4, abitW=4, method="ours", admm=True)
        state = create_train_state(
            jax.random.PRNGKey(0), model, cfg, input_shape=(1, 16, 16, 3),
            steps_per_epoch=10,
        )
        duals = create_local_duals(jax.random.PRNGKey(1), list(state.admm_duals), cfg, 4)
        state = state.replace(admm_duals=duals)
        name = sorted(duals)[0]
        assert duals[name].alter_d.shape == (4, 4, 4)

        step = make_local_corr_train_step(model, cfg, mesh)
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 16, 3))
        y = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 10)
        x, y = shard_batch((x, y), mesh)
        state, m = step(state, x, y)
        assert np.isfinite(float(m["loss"]))
        d = state.admm_duals[name]
        # each shard annealed its own duals from its own D
        assert not np.allclose(np.asarray(d.alter_d[0]), np.asarray(d.alter_d[1]))


class TestTPInt8Inference:
    def test_weight_sharded_int8_matches_replicated(self):
        """Weight-sharded (TP) + batch-sharded (DP) INT8 inference produces
        bit-identical results to the replicated run — the north-star
        'weight-sharded batched inference' path (BASELINE.json)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from jax.sharding import NamedSharding

        from alignq_tpu.kernels.infer import build_resnet20_int8

        mesh = make_mesh((2, 4), ("data", "model"))
        fwd, (qparams, x) = build_resnet20_int8(16)
        ref = np.asarray(fwd(qparams, x))

        def shard_q(path, leaf):
            if getattr(leaf, "ndim", 0) == 4 and leaf.shape[-1] % 4 == 0:
                return jax.device_put(
                    leaf, NamedSharding(mesh, P(None, None, None, "model"))
                )
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        qp = jax.tree_util.tree_map_with_path(shard_q, qparams)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        out = np.asarray(fwd(qp, xs))
        np.testing.assert_allclose(out, ref, atol=1e-4)
