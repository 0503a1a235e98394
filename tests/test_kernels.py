"""Pallas kernels (interpret mode on CPU) and the int8 inference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.kernels.convert import fold_conv_bn, quantize_weight_int8
from alignq_tpu.kernels.infer import (
    build_resnet20_int8,
    convert_resnet20,
    resnet20_int8_forward,
)
from alignq_tpu.kernels.qmatmul import (
    int8_matmul_dequant,
    int8_matmul_dequant_reference,
)
from alignq_tpu.kernels.quantize import (

    cdf_quantize_int8,
    cdf_quantize_int8_reference,
)

pytestmark = pytest.mark.slow  # compile-heavy integration (pyproject markers)


class TestQuantizeKernel:
    def test_matches_reference_exact(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (130, 48)) * 1.5
        got = np.asarray(cdf_quantize_int8(x))
        want = np.asarray(cdf_quantize_int8_reference(x))
        # the in-kernel erf approximation (1.5e-7 max err) may flip a round
        # for values within 1.5e-7 of a grid boundary — allow <=1 unit on a
        # vanishing fraction of elements
        diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3

    def test_odd_shapes_padded(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 33, 5))
        got = cdf_quantize_int8(x)
        assert got.shape == x.shape and got.dtype == jnp.int8

    def test_range_saturation(self):
        x = jnp.asarray([-100.0, 0.0, 100.0])[None, :]
        q = np.asarray(cdf_quantize_int8(x))[0]
        assert q[0] == -127 and q[1] == 0 and q[2] == 127


class TestQMatmul:
    def test_matches_reference(self):
        a = jax.random.randint(jax.random.PRNGKey(0), (100, 70), -127, 128, jnp.int8)
        w = jax.random.randint(jax.random.PRNGKey(1), (70, 50), -127, 128, jnp.int8)
        s = jax.random.uniform(jax.random.PRNGKey(2), (50,))
        b = jax.random.normal(jax.random.PRNGKey(3), (50,))
        for relu in (False, True):
            got = int8_matmul_dequant(a, w, s, b, relu=relu)
            want = int8_matmul_dequant_reference(a, w, s, b, relu=relu)
            # int32 accumulators reach ~1e6; f32 epilogue ulp there is ~0.06,
            # so compare relatively
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3
            )

    def test_no_bias(self):
        a = jnp.ones((32, 128), jnp.int8)
        w = jnp.ones((128, 128), jnp.int8)
        s = jnp.full((128,), 0.5)
        got = int8_matmul_dequant(a, w, s)
        np.testing.assert_allclose(np.asarray(got), 64.0, atol=1e-4)


class TestConvert:
    def test_weight_int8_grid(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 8, 16))
        q = np.asarray(quantize_weight_int8(w))
        assert q.dtype == np.int8
        assert q.min() >= -127 and q.max() <= 127
        # distribution should use most of the grid (CDF alignment flattens)
        assert len(np.unique(q)) > 100

    def test_bn_folding_formula(self):
        k = jnp.ones((1, 1, 2, 3))
        q = fold_conv_bn(
            k,
            bn_scale=jnp.asarray([2.0, 2.0, 2.0]),
            bn_bias=jnp.asarray([1.0, 1.0, 1.0]),
            bn_mean=jnp.asarray([0.5, 0.5, 0.5]),
            bn_var=jnp.asarray([4.0, 4.0, 4.0]),
            act_scale=0.1,
        )
        inv = 2.0 / np.sqrt(4.0 + 1e-5)
        np.testing.assert_allclose(q.scale, 0.1 / 127.0 * inv, rtol=1e-5)
        np.testing.assert_allclose(q.bias, 1.0 - 0.5 * inv, rtol=1e-5)


class TestInt8ResNet:
    def test_end_to_end_argmax_agreement(self):
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(bitW=8, abitW=8, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(6), x, train=False)
        logits_fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_resnet20(variables["params"], variables["batch_stats"])
        logits_i8 = np.asarray(resnet20_int8_forward(qp, x))
        agree = (logits_fq.argmax(-1) == logits_i8.argmax(-1)).mean()
        assert agree >= 0.75  # random-init nets; trained nets track closer

    def test_build_helper_compiles(self):
        fwd, args = build_resnet20_int8(4)
        out = fwd(*args)
        assert out.shape == (4, 10)
        assert np.isfinite(np.asarray(out)).all()

    def test_merged_skip_bitwise_identical(self):
        # the fused boundary conv (_int8_conv_merged_skip) must reproduce the
        # two-conv graph BIT-identically: same int32 accumulators, same
        # epilogue floats, same codes
        _, (qp, x) = build_resnet20_int8(8)
        a = np.asarray(resnet20_int8_forward(qp, x, fuse_skip=False))
        b = np.asarray(resnet20_int8_forward(qp, x, fuse_skip=True))
        assert np.array_equal(a, b)


class TestInt8MobileNet:
    def test_mobilenet_int8_agrees_with_fake_quant(self):
        from alignq_tpu.kernels.infer_mobilenet import (
            convert_mobilenetv2,
            mobilenetv2_int8_forward,
        )
        from alignq_tpu.models import mobile_v2

        model = mobile_v2(8, 8, "ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_mobilenetv2(variables["params"], variables["batch_stats"])
        i8 = np.asarray(mobilenetv2_int8_forward(qp, x))
        assert np.isfinite(i8).all()
        assert (fq.argmax(-1) == i8.argmax(-1)).mean() >= 0.75

    def test_int8_stream_bit_identical_to_int16_consumer_side(self):
        """The production graph stores the inter-block stream as int8 codes
        requantized at the PRODUCING block (infer_mobilenet.py docstring);
        this re-runs the original int16-stream formulation (code sum carried,
        requant at each consumer) and asserts bit equality — the refactor is
        a storage change, not a semantic one."""
        from alignq_tpu.kernels.infer import _act_g, _erfq_codes, _linear_q, _requant_codes
        from alignq_tpu.kernels.infer_mobilenet import (
            _conv,
            convert_mobilenetv2,
            mobilenetv2_int8_forward,
        )
        from alignq_tpu.kernels.infer import S_IMG
        from alignq_tpu.models import mobile_v2

        def int16_stream_forward(qparams, x, act_bits=8):
            g = _act_g(act_bits)
            act_scale = 2.0 / g
            h = _conv(_linear_q(x, S_IMG), qparams["conv1"], 1, 1)
            out_c = jnp.maximum(_erfq_codes(h, act_bits).astype(jnp.int16), 0)
            m_in = 1
            for blk in qparams["blocks"]:
                s = 1 if "shortcut" in blk else 2
                x8 = _requant_codes(out_c, m_in, g, signed=True)
                planes = blk["conv2"].kernel_int8.shape[-1]
                h = _conv(x8, blk["conv1"], 1, 0)
                r = jnp.maximum(_erfq_codes(h, act_bits), 0)
                h = _conv(r.astype(jnp.int8), blk["conv2"], s, 1, groups=planes)
                r = jnp.maximum(_erfq_codes(h, act_bits), 0)
                h = _conv(r.astype(jnp.int8), blk["conv3"], 1, 0)
                a3_c = _erfq_codes(h, act_bits).astype(jnp.int16)
                if "shortcut" in blk:
                    sc_h = _conv(x8, blk["shortcut"], 1, 0)
                    sc_c = jnp.maximum(
                        _erfq_codes(sc_h, act_bits).astype(jnp.int16), 0)
                    out_c, m_in = a3_c + sc_c, 2
                else:
                    out_c, m_in = a3_c, 1
            h = _conv(_requant_codes(out_c, m_in, g, signed=True),
                      qparams["conv2"], 1, 0)
            out = jnp.maximum(_erfq_codes(h, act_bits).astype(jnp.int16), 0)
            feat = jnp.mean(out.astype(jnp.float32), axis=(1, 2)) * act_scale
            return feat @ qparams["linear"]["kernel"] + qparams["linear"]["bias"]

        model = mobile_v2(8, 8, "ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(8), x, train=False)
        qp = convert_mobilenetv2(variables["params"], variables["batch_stats"])
        new = np.asarray(jax.jit(mobilenetv2_int8_forward)(qp, x))
        old = np.asarray(jax.jit(int16_stream_forward)(qp, x))
        np.testing.assert_array_equal(new, old)

    def test_mobilenet_block_structure(self):
        from alignq_tpu.kernels.infer_mobilenet import convert_mobilenetv2
        from alignq_tpu.models import mobile_v2

        model = mobile_v2(8, 8, "ours")
        x = jax.numpy.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        qp = convert_mobilenetv2(variables["params"], variables["batch_stats"])
        assert len(qp["blocks"]) == 17
        # stride-2 blocks (first of stages 3/4/6) have no shortcut
        strides = [s for (e, o, n, st) in
                   [(1,16,1,1),(6,24,2,1),(6,32,3,2),(6,64,4,2),(6,96,3,1),(6,160,3,2),(6,320,1,1)]
                   for s in [st] + [1]*(n-1)]
        for blk, s in zip(qp["blocks"], strides):
            assert ("shortcut" in blk) == (s == 1)


class TestInt8DenseNet:
    def test_densenet_int8_tracks_fake_quant(self):
        """Pre-activation structure -> every conv input is exact act codes;
        the int8 graph should track fake-quant almost exactly."""
        from alignq_tpu.kernels.infer_densenet import (
            convert_densenet40,
            densenet40_int8_forward,
        )
        from alignq_tpu.models import densenet_40_quant

        model = densenet_40_quant(8, 8, "ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_densenet40(variables["params"], variables["batch_stats"])
        i8 = np.asarray(densenet40_int8_forward(qp, x))
        assert np.isfinite(i8).all()
        assert (fq.argmax(-1) == i8.argmax(-1)).all()
        # only the stem image quantization separates the two graphs
        np.testing.assert_allclose(i8, fq, atol=0.2)

    def test_prealloc_stage_matches_concat(self):
        """The preallocated-buffer stage (consumers read a static prefix
        slice [:, :, :, :written] of the stage buffer, so BN/kernels cover
        exactly the written channels) is integer-exact vs the concat
        formulation; f32 epilogues may differ by 1 ulp (FMA contraction in
        a different fusion context)."""
        from alignq_tpu.kernels.infer_densenet import (
            convert_densenet40,
            densenet40_int8_forward,
        )
        from alignq_tpu.models import densenet_40_quant

        model = densenet_40_quant(8, 8, "ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(3), x, train=False)
        qp = convert_densenet40(variables["params"], variables["batch_stats"])
        l0 = np.asarray(densenet40_int8_forward(qp, x))
        l1 = np.asarray(densenet40_int8_forward(qp, x, prealloc=True))
        assert (l0.argmax(-1) == l1.argmax(-1)).all()
        np.testing.assert_allclose(l0, l1, atol=1e-5)


class TestInt8ResNetImageNet:
    def test_resnet18_feature_graph(self):
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_resnet_imagenet,
            resnet_imagenet_int8_forward,
        )
        from alignq_tpu.models import resnet18_quant

        model = resnet18_quant(8, 8, "ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_resnet_imagenet(variables["params"], variables["batch_stats"])
        i8 = np.asarray(resnet_imagenet_int8_forward(qp, x))
        assert i8.shape == (2, 512)
        assert np.isfinite(i8).all()
        corr = np.corrcoef(fq.ravel(), i8.ravel())[0, 1]
        assert corr > 0.95  # dynamic residual scales track the f32 identity path


class TestInt8Artifact:
    def test_save_load_roundtrip(self, tmp_path):
        from alignq_tpu.kernels.artifact import load_int8_artifact, save_int8_artifact
        from alignq_tpu.kernels.infer import (
            convert_preact_resnet,
            resnet20_int8_forward,
        )
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(8, 8, "ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        qp = convert_preact_resnet(variables["params"], variables["batch_stats"])
        want = np.asarray(resnet20_int8_forward(qp, x))

        path = str(tmp_path / "model_int8.npz")
        save_int8_artifact(path, qp, meta={"act_bits": 8})
        qp2, meta = load_int8_artifact(path, qp)
        assert int(meta["act_bits"]) == 8
        got = np.asarray(resnet20_int8_forward(qp2, x))
        np.testing.assert_array_equal(got, want)


class TestDANNDeploy:
    def test_dann_int8_tracks_fake_quant(self):
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_dann,
            dann_int8_forward,
        )
        from alignq_tpu.models import DANN

        model = DANN(arch="resnet18", num_classes=5, w_bit=8, a_bit=8,
                     method="ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        cls_fq, dom_fq = model.apply(variables, x, 0.0, train=False)
        qp, heads = convert_dann(variables["params"], variables["batch_stats"])
        cls_i8, dom_i8 = dann_int8_forward(qp, heads, x)
        assert cls_i8.shape == (2, 5) and dom_i8.shape == (2, 2)
        c = np.corrcoef(np.asarray(cls_fq).ravel(), np.asarray(cls_i8).ravel())[0, 1]
        assert c > 0.9

    def test_mdd_int8_tracks_fake_quant(self):
        """MDD deployment (VERDICT.md round-2 item 6): int8 trunk + f32
        bottleneck/classifier vs the QAT eval forward's `outputs` head."""
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_mdd,
            mdd_int8_forward,
        )
        from alignq_tpu.models.mdd import MDDNet

        model = MDDNet(arch="resnet18", num_classes=5, bottleneck_dim=32,
                       width=32, w_bit=8, a_bit=8, method="ours",
                       variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(5), x, train=False)
        _, out_fq, _, _ = model.apply(variables, x, 0.0, train=False)
        qp, heads = convert_mdd(variables["params"], variables["batch_stats"])
        out_i8 = mdd_int8_forward(qp, heads, x)
        assert out_i8.shape == (2, 5)
        assert "bottleneck_fc" in heads and "classifier_adv" not in heads
        c = np.corrcoef(np.asarray(out_fq).ravel(), np.asarray(out_i8).ravel())[0, 1]
        assert c > 0.9

    def test_dsan_int8_tracks_fake_quant(self):
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_dsan,
            dsan_int8_forward,
        )
        from alignq_tpu.models import DSAN

        model = DSAN(arch="resnet18", num_classes=5, w_bit=8, a_bit=8,
                     method="ours", variant="int8", bottle_neck=True)
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(3), x, train=False)
        pred_fq = model.apply(variables, x, train=False)  # target=None -> s_pred
        qp, heads = convert_dsan(variables["params"], variables["batch_stats"])
        pred_i8 = dsan_int8_forward(qp, heads, x)
        assert pred_i8.shape == (2, 5)
        assert "bottle" in heads
        c = np.corrcoef(np.asarray(pred_fq).ravel(), np.asarray(pred_i8).ravel())[0, 1]
        assert c > 0.9


class TestDigitDeploy:
    def test_mnist_dann_int8_agrees_with_fake_quant(self):
        """Digit DANN CNN: INT8 conv trunk + f32 MLP heads vs the QAT eval
        forward. The trunk has NO requant site (stem aside), so random-init
        agreement is tight."""
        from alignq_tpu.kernels.infer_digit import (
            convert_mnist_dann,
            mnist_dann_int8_forward,
        )
        from alignq_tpu.models import mnist_model_quant

        model = mnist_model_quant(bitW=8, abitW=8, method="ours", variant="int8")
        # digit inputs are normalized to [-1, 1] (data/digits.py mean/std .5)
        x = jax.random.uniform(
            jax.random.PRNGKey(4), (16, 28, 28, 3), minval=-1.0, maxval=1.0
        )
        variables = model.init(jax.random.PRNGKey(5), x, train=False)
        cls_fq, dom_fq = model.apply(variables, x, 0.0, train=False)
        qp = convert_mnist_dann(variables["params"], variables["batch_stats"])
        cls_i8, dom_i8 = mnist_dann_int8_forward(qp, x)
        assert cls_i8.shape == (16, 10) and dom_i8.shape == (16, 2)
        agree = (
            np.asarray(cls_fq).argmax(-1) == np.asarray(cls_i8).argmax(-1)
        ).mean()
        assert agree >= 0.9
        c = np.corrcoef(np.asarray(dom_fq).ravel(), np.asarray(dom_i8).ravel())[0, 1]
        assert c > 0.9

    def test_grayscale_input_tiled(self):
        from alignq_tpu.kernels.infer_digit import (
            convert_mnist_dann,
            mnist_dann_int8_forward,
        )
        from alignq_tpu.models import mnist_model_quant

        model = mnist_model_quant(bitW=8, abitW=8, method="ours", variant="int8")
        x1 = jax.random.uniform(
            jax.random.PRNGKey(6), (2, 28, 28, 1), minval=-1.0, maxval=1.0
        )
        variables = model.init(jax.random.PRNGKey(7), x1, train=False)
        qp = convert_mnist_dann(variables["params"], variables["batch_stats"])
        cls1, _ = mnist_dann_int8_forward(qp, x1)
        cls3, _ = mnist_dann_int8_forward(qp, jnp.tile(x1, (1, 1, 1, 3)))
        np.testing.assert_array_equal(np.asarray(cls1), np.asarray(cls3))


class TestArtifactMeta:
    def test_forward_kwargs_from_meta_roundtrip(self, tmp_path):
        """Export-time deploy options survive the artifact and map back to
        forward kwargs (the wrong-graph-silent-accuracy-loss guard)."""
        import numpy as np

        from alignq_tpu.kernels.artifact import (
            forward_kwargs_from_meta,
            load_int8_artifact,
            save_int8_artifact,
        )

        qp = {"w": np.arange(4, dtype=np.int8)}
        path = str(tmp_path / "art.npz")
        save_int8_artifact(path, qp, meta={
            "model": "resnet20", "act_bits": 8, "act_impl": "poly",
            "stream": "int8", "deploy_exact": 1,
        })
        _, meta = load_int8_artifact(path, qp)
        kw = forward_kwargs_from_meta(meta)
        assert kw == {"act_bits": 8, "act_impl": "poly", "stream": "int8"}

    def test_forward_kwargs_rejects_garbage(self):
        import pytest

        from alignq_tpu.kernels.artifact import forward_kwargs_from_meta

        with pytest.raises(AssertionError):
            forward_kwargs_from_meta({"act_impl": "fast"})
