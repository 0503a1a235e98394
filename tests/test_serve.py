"""Batched INT8 serving engine."""

import numpy as np
import jax
import pytest

from alignq_tpu.models import resnet20_quant
from alignq_tpu.serve import build_int8_resnet20_engine

pytestmark = pytest.mark.slow  # compile-heavy integration (pyproject markers)


class TestServing:
    def test_submit_and_batching(self):
        model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        engine = build_int8_resnet20_engine(
            variables["params"], variables["batch_stats"], batch_size=8
        )
        try:
            rng = np.random.RandomState(0)
            reqs = [rng.randn(n, 32, 32, 3).astype(np.float32) for n in (3, 5, 2)]
            futs = [engine.submit(r) for r in reqs]
            outs = [f.result(timeout=120) for f in futs]
            for r, o in zip(reqs, outs):
                assert o.shape == (r.shape[0], 10)
                assert np.isfinite(o).all()
            # determinism: same request twice -> same logits
            o1 = engine.submit(reqs[0]).result(timeout=120)
            o2 = engine.submit(reqs[0]).result(timeout=120)
            np.testing.assert_allclose(o1, o2, atol=1e-5)
        finally:
            engine.close()

    def test_engine_from_artifact(self, tmp_path):
        """Artifact meta drives the engine's deploy-graph choice."""
        from alignq_tpu.kernels.artifact import save_int8_artifact
        from alignq_tpu.kernels.infer import convert_resnet20
        from alignq_tpu.serve import engine_from_artifact

        model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(2), x, train=False)
        qp = convert_resnet20(variables["params"], variables["batch_stats"])
        path = str(tmp_path / "model.npz")
        save_int8_artifact(path, qp, meta={
            "model": "resnet20", "act_bits": 8, "act_impl": "poly",
            "stream": "int8",
        })
        engine = engine_from_artifact(path, batch_size=4)
        try:
            out = engine.submit(
                np.random.RandomState(1).randn(4, 32, 32, 3).astype(np.float32)
            ).result(timeout=120)
            assert out.shape == (4, 10) and np.isfinite(out).all()
        finally:
            engine.close()

    def test_engine_from_packed_int4_artifact(self, tmp_path):
        """An int4-packed W4A4 artifact (tools/export_int8.py --pack_int4)
        serves bit-identically to the unpacked jitted graph — the packed
        format is transparent at the API boundary."""
        import functools

        import jax.numpy as jnp

        from alignq_tpu.kernels.artifact import save_int8_artifact
        from alignq_tpu.kernels.convert import pack_qparams_int4
        from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
        from alignq_tpu.serve import engine_from_artifact

        model = resnet20_quant(bitW=4, abitW=4, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(6), x, train=False)
        qp = convert_resnet20(
            variables["params"], variables["batch_stats"],
            weight_bits=4, act_bits=4,
        )
        path = str(tmp_path / "model_w4_packed.npz")
        save_int8_artifact(path, pack_qparams_int4(qp), meta={
            "model": "resnet20", "act_bits": 4, "weight_bits": 4,
            "act_impl": "bins", "stream": "int16", "packed_int4": 1,
        })
        engine = engine_from_artifact(path, batch_size=4)
        try:
            img = np.random.RandomState(7).randn(4, 32, 32, 3).astype(np.float32)
            out = engine.submit(img).result(timeout=120)
        finally:
            engine.close()
        ref = np.asarray(
            jax.jit(
                functools.partial(
                    resnet20_int8_forward, act_bits=4, act_impl="bins"
                )
            )(qp, jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_fast_path_options(self):
        """act_impl/stream reach the engine's deploy graph."""
        model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        engine = build_int8_resnet20_engine(
            variables["params"], variables["batch_stats"], batch_size=4,
            act_impl="poly", stream="int8",
        )
        try:
            out = engine.submit(
                np.random.RandomState(0).randn(4, 32, 32, 3).astype(np.float32)
            ).result(timeout=120)
            assert out.shape == (4, 10) and np.isfinite(out).all()
        finally:
            engine.close()

    def test_mesh_serving_matches_replicated(self):
        """Engine with a (2, 4) data x model mesh (TP weight sharding + DP
        batch sharding) returns the same logits as the single-device engine
        (VERDICT.md round-1 item 9: TP serving as an engine feature)."""
        import pytest

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from alignq_tpu.dist import make_mesh

        model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(3), x, train=False)
        img = np.random.RandomState(4).randn(8, 32, 32, 3).astype(np.float32)

        plain = build_int8_resnet20_engine(
            variables["params"], variables["batch_stats"], batch_size=8
        )
        try:
            ref = plain.submit(img).result(timeout=120)
        finally:
            plain.close()

        mesh = make_mesh((2, 4), ("data", "model"))
        tp = build_int8_resnet20_engine(
            variables["params"], variables["batch_stats"], batch_size=8,
            mesh=mesh,
        )
        try:
            out = tp.submit(img).result(timeout=120)
        finally:
            tp.close()
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_mesh_batch_divisibility_check(self):
        import pytest

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from alignq_tpu.dist import make_mesh

        model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(5), x, train=False)
        mesh = make_mesh((8,), ("data",))
        with pytest.raises(ValueError, match="divisible"):
            build_int8_resnet20_engine(
                variables["params"], variables["batch_stats"], batch_size=12,
                mesh=mesh,
            )

    def test_padding_does_not_leak(self):
        """A 1-image request in an 8-batch engine: padding rows must not
        affect the real row."""
        model = resnet20_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        engine = build_int8_resnet20_engine(
            variables["params"], variables["batch_stats"], batch_size=8
        )
        try:
            img = np.random.RandomState(2).randn(1, 32, 32, 3).astype(np.float32)
            single = engine.submit(img).result(timeout=120)
            batch8 = engine.submit(np.repeat(img, 8, axis=0)).result(timeout=120)
            np.testing.assert_allclose(single[0], batch8[0], atol=1e-4)
        finally:
            engine.close()
