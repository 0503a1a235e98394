"""Quantized cross-device reductions on the virtual mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from alignq_tpu.dist import make_mesh, shard_batch
from alignq_tpu.dist.collectives import compressed_pmean


@pytest.fixture(scope="module")
def mesh4():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    return make_mesh((4,), ("data",))


def run_pmean(mesh, x_global, mode):
    f = jax.shard_map(
        functools.partial(compressed_pmean, axis_name="data", mode=mode),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
        check_vma=False,
    )
    return np.asarray(jax.jit(f)(x_global))


class TestCompressedPmean:
    def test_f32_exact(self, mesh4):
        x = np.random.RandomState(0).randn(8, 16).astype(np.float32)
        got = run_pmean(mesh4, jnp.asarray(x), "f32")
        want = x.reshape(4, 2, 16).mean(0)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_bf16_close(self, mesh4):
        x = np.random.RandomState(1).randn(8, 16).astype(np.float32)
        got = run_pmean(mesh4, jnp.asarray(x), "bf16")
        want = x.reshape(4, 2, 16).mean(0)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_int8_gather_close_and_bounded(self, mesh4):
        x = np.random.RandomState(2).randn(8, 64).astype(np.float32)
        got = run_pmean(mesh4, jnp.asarray(x), "int8_gather")
        want = x.reshape(4, 2, 64).mean(0)
        # per-shard rounding error <= scale/2 = max|x|/254
        bound = np.abs(x).max() / 254.0 + 1e-6
        assert np.abs(got - want).max() <= bound

    def test_int8_zero_tensor(self, mesh4):
        x = jnp.zeros((8, 8))
        got = run_pmean(mesh4, x, "int8_gather")
        np.testing.assert_array_equal(got, np.zeros((2, 8)))

    def test_unknown_mode_raises(self, mesh4):
        with pytest.raises(ValueError):
            run_pmean(mesh4, jnp.zeros((8, 4)), "int3")


class TestCompressedTrainStep:
    def test_int8_compressed_dp_step_close_to_exact(self, mesh4):
        """A shard_map DP step with int8 gradient compression stays close to
        the exact-f32 step."""
        from alignq_tpu.dist.corr import create_local_duals, make_local_corr_train_step
        from alignq_tpu.models import resnet20_quant
        from alignq_tpu.train import TrainConfig, create_train_state

        def build(mode):
            cfg = TrainConfig(
                train_batch_size=16, bitW=4, abitW=4, admm=True,
                grad_compression=mode,
            )
            model = resnet20_quant(bitW=4, abitW=4, method="ours", admm=True)
            state = create_train_state(
                jax.random.PRNGKey(0), model, cfg, input_shape=(1, 16, 16, 3),
                steps_per_epoch=10,
            )
            duals = create_local_duals(
                jax.random.PRNGKey(1), list(state.admm_duals), cfg, 4
            )
            state = state.replace(admm_duals=duals)
            return cfg, model, state

        x = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 16, 3))
        y = jax.random.randint(jax.random.PRNGKey(3), (16,), 0, 10)
        xs, ys = shard_batch((x, y), mesh4)

        results = {}
        for mode in ("f32", "int8_gather"):
            cfg, model, state = build(mode)
            step = make_local_corr_train_step(model, cfg, mesh4)
            new_state, m = step(state, xs, ys)
            results[mode] = (
                float(m["loss"]),
                np.asarray(jax.tree.leaves(new_state.params)[0]),
            )
        # losses identical (compression applies to grads, not the loss)
        np.testing.assert_allclose(results["f32"][0], results["int8_gather"][0], rtol=1e-5)
        # updated params close but not identical
        a, b = results["f32"][1], results["int8_gather"][1]
        assert not np.array_equal(a, b)
        np.testing.assert_allclose(a, b, atol=5e-3)
