"""Partial pretrained-weight loading (reference main.py:62-82)."""

import jax
import jax.numpy as jnp
import numpy as np

from alignq_tpu.models import resnet20_quant
from alignq_tpu.train import TrainConfig, create_train_state, make_train_step
from alignq_tpu.train.checkpoint import CheckpointManager
from alignq_tpu.train.pretrained import load_pretrained, merge_pretrained

import pytest

pytestmark = pytest.mark.slow  # compile-heavy integration (pyproject markers)


class TestMerge:
    def test_matching_leaves_taken_shape_mismatch_kept(self):
        target = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)), "c": jnp.zeros(4)}
        source = {"a": jnp.ones((2, 2)), "b": jnp.ones((5,)), "d": jnp.ones(4)}
        merged, n, total = merge_pretrained(target, source)
        assert (np.asarray(merged["a"]) == 1).all()  # matched
        assert (np.asarray(merged["b"]) == 0).all()  # shape mismatch -> fresh
        assert (np.asarray(merged["c"]) == 0).all()  # missing in source
        assert n == 1 and total == 3


class TestLoadPretrained:
    def test_8bit_pretrain_into_4bit_admm_run(self, tmp_path):
        """The canonical reference flow: train 8-bit, warm-start the
        4-bit+ADMM run from it (source has no duals; target does)."""
        cfg8 = TrainConfig(train_batch_size=8, bitW=8, abitW=8,
                           job_dir=str(tmp_path / "w8"))
        m8 = resnet20_quant(8, 8, "ours")
        s8 = create_train_state(jax.random.PRNGKey(0), m8, cfg8,
                                input_shape=(1, 16, 16, 3), steps_per_epoch=4)
        step = jax.jit(make_train_step(m8, cfg8))
        x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
        y = jnp.zeros((8,), jnp.int32)
        s8, _ = step(s8, x, y)
        mgr = CheckpointManager(str(tmp_path / "w8"))
        mgr.save(1, s8, metrics={"top1": 50.0})
        mgr.wait()
        mgr.close()

        cfg4 = TrainConfig(train_batch_size=8, bitW=4, abitW=4, admm=True,
                           job_dir=str(tmp_path / "w4"))
        m4 = resnet20_quant(4, 4, "ours", admm=True)
        s4 = create_train_state(jax.random.PRNGKey(2), m4, cfg4,
                                input_shape=(1, 16, 16, 3), steps_per_epoch=4)
        before = np.asarray(jax.tree.leaves(s4.params)[0]).copy()
        s4 = load_pretrained(s4, str(tmp_path / "w8"))
        after = np.asarray(jax.tree.leaves(s4.params)[0])
        # weights replaced by the 8-bit run's
        assert not np.allclose(before, after)
        want = np.asarray(jax.tree.leaves(s8.params)[0])
        np.testing.assert_array_equal(after, want)
        # duals stay fresh and the state still trains
        assert len(s4.admm_duals) == 21
        step4 = jax.jit(make_train_step(m4, cfg4))
        _, m = step4(s4, x, y)
        assert np.isfinite(float(m["loss"]))

    def test_missing_source_is_noop(self, tmp_path):
        cfg = TrainConfig(train_batch_size=8, bitW=4, abitW=4)
        model = resnet20_quant(4, 4, "ours")
        s = create_train_state(jax.random.PRNGKey(0), model, cfg,
                               input_shape=(1, 16, 16, 3), steps_per_epoch=4)
        s2 = load_pretrained(s, str(tmp_path / "nothing"))
        np.testing.assert_array_equal(
            np.asarray(jax.tree.leaves(s.params)[0]),
            np.asarray(jax.tree.leaves(s2.params)[0]),
        )
