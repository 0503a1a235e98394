"""Distributed fit(): cfg.mesh_shape / corr_mode / grad_compression are live
user-facing knobs (VERDICT.md round-1 item 1).

Covers: gather-mode fit == single-device fit on the same data stream;
local-mode fit with per-shard duals trains and checkpoints roundtrip;
CLI --mesh/--corr_mode parse into the config.
"""

import jax
import numpy as np
import pytest

from alignq_tpu.data.loader import ArrayLoader, Data
from alignq_tpu.train import TrainConfig
from alignq_tpu.train.cli import parse_args
from alignq_tpu.train.loop import fit

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def tiny_data(batch_size=16, n=64, shape=(16, 16, 3), seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, *shape).astype(np.float32)
    y = (x.mean(axis=(1, 2, 3)) > 0).astype(np.int64)
    tr = ArrayLoader(x, y, batch_size, shuffle=True, seed=seed, prefetch=0)
    te = ArrayLoader(x[:32], y[:32], batch_size, prefetch=0)
    return Data(tr, te)


def base_cfg(tmp_path, **kw):
    base = dict(
        target_model="resnet20_quant",
        bitW=4,
        abitW=4,
        train_batch_size=16,
        eval_batch_size=16,
        num_epochs=1,
        lr=0.01,
        print_freq=1000,
        job_dir=str(tmp_path),
        num_classes=10,
    )
    base.update(kw)
    return TrainConfig(**base)


class TestGatherMode:
    def test_matches_single_device(self, tmp_path):
        """GSPMD-sharded fit must reproduce the single-device update (exact
        global-batch semantics). Compared at 32-bit: with quantization on,
        round() amplifies reduction-order float noise into grid-step
        activation flips, so even one 4-bit step is chaotic (verified: at
        32-bit the sharded update is bit-identical, at 4-bit it is not).
        4-bit sharded==single loss equivalence is covered by
        tests/test_dist.py::TestDPGradEquivalence."""
        cfg1 = base_cfg(tmp_path / "single", mesh_shape=(1,), bitW=32, abitW=32)
        cfgN = base_cfg(
            tmp_path / "mesh", mesh_shape=(8,), mesh_axes=("data",),
            corr_mode="gather", bitW=32, abitW=32,
        )
        r1 = fit(cfg1, tiny_data(), max_steps=2)
        rN = fit(cfgN, tiny_data(), max_steps=2)
        p1 = jax.tree.leaves(r1["state"].params)
        pN = jax.tree.leaves(rN["state"].params)
        for a, b in zip(p1, pN):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


class TestTensorParallelTraining:
    def test_tp_matches_single_device(self, tmp_path):
        """DPxTP fit (mesh 2x4, kernels output-channel-sharded over 'model')
        reproduces the single-device update at 32-bit — the TP-training
        analog of TestGatherMode (round-1 parallelism census: 'TP training
        never exercised')."""
        cfg1 = base_cfg(tmp_path / "single", mesh_shape=(1,), bitW=32, abitW=32)
        cfgT = base_cfg(
            tmp_path / "tp", mesh_shape=(2, 4), mesh_axes=("data", "model"),
            corr_mode="gather", bitW=32, abitW=32,
        )
        r1 = fit(cfg1, tiny_data(), max_steps=2)
        rT = fit(cfgT, tiny_data(), max_steps=2)
        for a, b in zip(
            jax.tree.leaves(r1["state"].params), jax.tree.leaves(rT["state"].params)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_tp_quantized_smoke_and_sharded_kernels(self, tmp_path):
        """4-bit QAT trains under TP and the conv kernels really are
        channel-sharded on the 'model' axis (not silently replicated)."""
        cfg = base_cfg(
            tmp_path, mesh_shape=(1, 8), mesh_axes=("data", "model"),
            corr_mode="gather",
        )
        result = fit(cfg, tiny_data(), max_steps=2)
        kernel = result["state"].params["layers_3"]["conv0"]["kernel"]
        spec = kernel.sharding.spec
        assert "model" in jax.tree.leaves(tuple(spec)), spec
        assert np.isfinite(np.asarray(kernel)).all()

    def test_tp_local_mode_raises(self, tmp_path):
        cfg = base_cfg(
            tmp_path, mesh_shape=(2, 4), mesh_axes=("data", "model"),
            corr_mode="local",
        )
        with pytest.raises(ValueError, match="tensor-parallel"):
            fit(cfg, tiny_data())


class TestLocalMode:
    def test_trains_and_roundtrips(self, tmp_path):
        cfg = base_cfg(
            tmp_path, mesh_shape=(8,), mesh_axes=("data",),
            corr_mode="local", admm=True, grad_compression="bf16",
        )
        data = tiny_data()
        result = fit(cfg, data, max_steps=3)
        state = result["state"]
        # per-shard duals: (n_data, B_local, B_local)
        name = sorted(state.admm_duals)[0]
        assert state.admm_duals[name].alter_d.shape == (8, 2, 2)
        # checkpoint with per-shard duals roundtrips via resume
        result2 = fit(cfg, tiny_data(), resume=True, max_steps=2)
        assert int(result2["state"].step) > int(state.step) - 3

    def test_batch_not_divisible_raises(self, tmp_path):
        cfg = base_cfg(
            tmp_path, mesh_shape=(8,), mesh_axes=("data",),
            train_batch_size=12,
        )
        with pytest.raises(ValueError, match="not divisible"):
            fit(cfg, tiny_data(batch_size=12))


class TestCLIMeshFlags:
    def test_mesh_flag_parses(self):
        cfg, _, _, _ = parse_args(
            ["--mesh", "8", "--corr_mode", "local",
             "--grad_compression", "bf16", "--mxu_bf16"]
        )
        assert tuple(cfg.mesh_shape) == (8,)
        assert cfg.mesh_axes == ("data",)
        assert cfg.corr_mode == "local"
        assert cfg.grad_compression == "bf16"
        assert cfg.mxu_bf16 is True

    def test_mesh_2d(self):
        cfg, _, _, _ = parse_args(["--mesh", "4", "2"])
        assert tuple(cfg.mesh_shape) == (4, 2)
        assert cfg.mesh_axes == ("data", "model")


class TestDistributedDA:
    """DA loops take a mesh (VERDICT r3 item 4): gather-mode DP through
    fit_dann, exact global-batch corr/LMMD semantics by GSPMD."""

    def _loaders(self):
        from alignq_tpu.data.digits import get_digit_domain

        return {
            "src_train": get_digit_domain("mnist", "/nonexistent", 8,
                                          train=True, img_size=32),
            "tgt_train": get_digit_domain("mnistm", "/nonexistent", 8,
                                          train=True, img_size=32),
            "tgt_test": get_digit_domain("mnistm", "/nonexistent", 8,
                                         train=False, img_size=32),
            "src_test": get_digit_domain("mnist", "/nonexistent", 8,
                                         train=False, img_size=32),
        }

    def _cfg(self, job_dir, **kw):
        from alignq_tpu.train.da import DAConfig

        base = dict(
            train_batch_size=8, eval_batch_size=8, bitW=32, abitW=32,
            num_classes=10, num_epochs=1, job_dir=str(job_dir),
            correction_exclude=(), lr=0.01,
        )
        base.update(kw)
        return DAConfig(**base)

    def test_dann_dp_matches_single_device(self, tmp_path):
        """8-virtual-device gather-mode fit_dann reproduces the
        single-device update at 32-bit (same caveat as
        TestGatherMode.test_matches_single_device: quantized grids amplify
        reduction-order noise into chaotic flips, so the equivalence
        statement is made where it is exact)."""
        from alignq_tpu.models import mnist_model_quant
        from alignq_tpu.train.da import fit_dann

        model = mnist_model_quant(bitW=32, abitW=32, method="ours")
        r1 = fit_dann(self._cfg(tmp_path / "s"), self._loaders(), model,
                      max_steps=2)
        rN = fit_dann(
            self._cfg(tmp_path / "m", mesh_shape=(8,), mesh_axes=("data",),
                      corr_mode="gather"),
            self._loaders(), model, max_steps=2,
        )
        for a, b in zip(
            jax.tree.leaves(r1["state"].params),
            jax.tree.leaves(rN["state"].params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )
        assert r1["best_tgt_top1"] == pytest.approx(
            rN["best_tgt_top1"], abs=0.5
        )

    def test_dann_dp_admm_smoke(self, tmp_path):
        """Quantized DANN + ADMM under DP: the global-B x B corr matrices
        gather across shards; duals stay (B, B) replicated; loss finite."""
        from alignq_tpu.models import mnist_model_quant
        from alignq_tpu.train.da import fit_dann

        model = mnist_model_quant(bitW=4, abitW=4, method="ours", admm=True)
        r = fit_dann(
            self._cfg(tmp_path, bitW=4, abitW=4, admm=True, mesh_shape=(8,),
                      mesh_axes=("data",), corr_mode="gather"),
            self._loaders(), model, max_steps=2,
        )
        assert np.isfinite(r["best_tgt_top1"])
        name = sorted(r["state"].admm_duals)[0]
        assert r["state"].admm_duals[name].alter_d.shape == (8, 8)

    def test_local_mode_rejected(self, tmp_path):
        from alignq_tpu.models import mnist_model_quant
        from alignq_tpu.train.da import fit_dann

        model = mnist_model_quant(bitW=4, abitW=4, method="ours")
        with pytest.raises(ValueError, match="gather"):
            fit_dann(
                self._cfg(tmp_path, mesh_shape=(8,), mesh_axes=("data",),
                          corr_mode="local"),
                self._loaders(), model, max_steps=1,
            )

    def test_model_axis_rejected(self, tmp_path):
        from alignq_tpu.models import mnist_model_quant
        from alignq_tpu.train.da import fit_dann

        model = mnist_model_quant(bitW=4, abitW=4, method="ours")
        with pytest.raises(ValueError, match="data axis"):
            fit_dann(
                self._cfg(tmp_path, mesh_shape=(4, 2),
                          mesh_axes=("data", "model"), corr_mode="gather"),
                self._loaders(), model, max_steps=1,
            )
