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

    def test_engine_from_bins_int_artifact(self, tmp_path):
        """A bins_int W4A4 artifact serves bit-identically to the jitted
        integer-cutpoint graph. The artifact stores the family-uniform
        (unaugmented) tree; engine_from_artifact re-derives the cutpoints
        from the loaded scale/bias (serve.py)."""
        import functools

        import jax.numpy as jnp

        from alignq_tpu.kernels.artifact import save_int8_artifact
        from alignq_tpu.kernels.infer import (
            augment_int_cutpoints,
            convert_resnet20,
            resnet20_int8_forward,
        )
        from alignq_tpu.serve import engine_from_artifact

        model = resnet20_quant(bitW=4, abitW=4, method="ours", variant="int8")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(9), x, train=False)
        qp = convert_resnet20(
            variables["params"], variables["batch_stats"],
            weight_bits=4, act_bits=4,
        )
        path = str(tmp_path / "model_w4_binsint.npz")
        save_int8_artifact(path, qp, meta={
            "model": "resnet20", "act_bits": 4, "weight_bits": 4,
            "act_impl": "bins_int", "stream": "int16",
        })
        engine = engine_from_artifact(path, batch_size=4)
        try:
            img = np.random.RandomState(11).randn(4, 32, 32, 3).astype(
                np.float32
            )
            out = engine.submit(img).result(timeout=120)
        finally:
            engine.close()
        ref = np.asarray(
            jax.jit(
                functools.partial(
                    resnet20_int8_forward, act_bits=4, act_impl="bins_int"
                )
            )(augment_int_cutpoints(qp, 4), jnp.asarray(img))
        )
        np.testing.assert_array_equal(out, ref)

    def test_engine_from_artifact_unknown_family(self, tmp_path):
        from alignq_tpu.kernels.artifact import save_int8_artifact
        from alignq_tpu.serve import engine_from_artifact

        path = str(tmp_path / "bogus.npz")
        save_int8_artifact(path, {"w": np.zeros(1)}, meta={"model": "vgg"})
        with pytest.raises(ValueError, match="deploy registry"):
            engine_from_artifact(path)

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

    def test_registry_roundtrip_all_families(self, tmp_path):
        """Registry-driven artifact serving (VERDICT r4 item 4): every
        deploy family — the four CIFAR nets (DenseNet in its stage-int8
        buffer form), an ImageNet ResNet, an office DA export, and the
        digit DANN — roundtrips save -> engine_from_artifact bit-identically
        to the direct jitted INT graph on the same qparams."""
        import functools

        import jax.numpy as jnp

        from alignq_tpu.kernels.artifact import save_int8_artifact
        from alignq_tpu.serve import engine_from_artifact

        rng = np.random.RandomState(11)

        def roundtrip(name, payload, meta, direct_fwd, shape, batch=2):
            path = str(tmp_path / f"{name}.npz")
            save_int8_artifact(path, payload, meta=meta)
            engine = engine_from_artifact(path, batch_size=batch)
            try:
                img = rng.randn(batch, *shape).astype(np.float32)
                out = engine.submit(img).result(timeout=300)
            finally:
                engine.close()
            ref = np.asarray(jax.jit(direct_fwd)(payload, jnp.asarray(img)))
            np.testing.assert_array_equal(out, ref, err_msg=name)

        # resnet56 (8-bit erf)
        from alignq_tpu.kernels.infer import (
            convert_preact_resnet,
            resnet20_int8_forward,
        )
        from alignq_tpu.models import resnet56_quant

        m = resnet56_quant(bitW=8, abitW=8, method="ours", variant="int8")
        v = m.init(jax.random.PRNGKey(0), jax.numpy.zeros((1, 32, 32, 3)),
                   train=False)
        qp = convert_preact_resnet(v["params"], v["batch_stats"])
        roundtrip("resnet56", qp,
                  {"model": "resnet56", "act_bits": 8, "weight_bits": 8,
                   "act_impl": "erf", "stream": "int16"},
                  resnet20_int8_forward, (32, 32, 3))

        # densenet40 in the stage-int8 buffer form
        from alignq_tpu.kernels.infer_densenet import (
            convert_densenet40,
            densenet40_int8_forward,
        )
        from alignq_tpu.models import densenet_40_quant

        m = densenet_40_quant(bitW=8, abitW=8, method="ours", variant="int8",
                              deploy_exact=True, stage_int8=True)
        v = m.init(jax.random.PRNGKey(1), jax.numpy.zeros((1, 32, 32, 3)),
                   train=False)
        qp = convert_densenet40(v["params"], v["batch_stats"], stage_int8=True)
        roundtrip("densenet40", qp,
                  {"model": "densenet40", "act_bits": 8, "weight_bits": 8,
                   "act_impl": "erf", "stage_int8": 1},
                  functools.partial(densenet40_int8_forward, stage_int8=True),
                  (32, 32, 3))

        # mobilenetv2
        from alignq_tpu.kernels.infer_mobilenet import (
            convert_mobilenetv2,
            mobilenetv2_int8_forward,
        )
        from alignq_tpu.models import mobile_v2

        m = mobile_v2(bitW=8, abitW=8, method="ours", variant="int8")
        v = m.init(jax.random.PRNGKey(2), jax.numpy.zeros((1, 32, 32, 3)),
                   train=False)
        qp = convert_mobilenetv2(v["params"], v["batch_stats"])
        roundtrip("mobilenetv2", qp,
                  {"model": "mobilenetv2", "act_bits": 8, "weight_bits": 8,
                   "act_impl": "erf"},
                  mobilenetv2_int8_forward, (32, 32, 3))

        # resnet50 (ImageNet layout, small spatial size to keep CPU cheap)
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_resnet_imagenet,
            resnet_imagenet_int8_forward,
        )
        from alignq_tpu.models import resnet50_quant

        m = resnet50_quant(bitW=8, abitW=8, method="ours", variant="int8")
        v = m.init(jax.random.PRNGKey(3), jax.numpy.zeros((1, 64, 64, 3)),
                   train=False)
        qp = convert_resnet_imagenet(v["params"], v["batch_stats"])
        # trunk returns features, not logits — still a single array
        roundtrip("resnet50", qp,
                  {"model": "resnet50", "act_bits": 8, "weight_bits": 8,
                   "act_impl": "erf", "image_size": 64},
                  resnet_imagenet_int8_forward, (64, 64, 3))

        # DA export: DANN on a resnet18 trunk (class-logit serving)
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_dann,
            dann_int8_forward,
        )
        from alignq_tpu.models import DANN

        m = DANN(arch="resnet18", num_classes=31, w_bit=8, a_bit=8,
                 method="ours", variant="int8")
        v = m.init(jax.random.PRNGKey(4), jax.numpy.zeros((1, 64, 64, 3)),
                   0.0, train=False)
        trunk, heads = convert_dann(v["params"], v["batch_stats"])
        roundtrip("dann", {"trunk": trunk, "heads": heads},
                  {"model": "dann", "arch": "resnet18", "act_bits": 8,
                   "weight_bits": 8, "act_impl": "erf", "image_size": 64,
                   "num_classes": 31},
                  lambda p, x: dann_int8_forward(p["trunk"], p["heads"], x)[0],
                  (64, 64, 3))

        # digit DANN
        from alignq_tpu.kernels.infer_digit import (
            convert_mnist_dann,
            mnist_dann_int8_forward,
        )
        from alignq_tpu.models import mnist_model_quant

        m = mnist_model_quant(bitW=8, abitW=8, method="ours", variant="int8")
        v = m.init(jax.random.PRNGKey(5), jax.numpy.zeros((1, 28, 28, 3)),
                   0.0, train=False)
        qp = convert_mnist_dann(v["params"], v["batch_stats"])
        roundtrip("digit_dann", qp,
                  {"model": "digit_dann", "act_bits": 8, "weight_bits": 8,
                   "act_impl": "erf", "img_size": 28},
                  lambda p, x: mnist_dann_int8_forward(p, x)[0],
                  (28, 28, 3))

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
