"""The int8 residual-stream deploy option (stream='int8').

kernels/infer.py resnet20_int8_forward(stream='int8') requantizes the FULL
inter-block stream (identity shortcut included) at each block edge so the
stored stream is int8 codes — half the HBM bytes of the exact int16 code
sum, at the cost of log2(m) <= 2 bits of stream resolution per edge. The
matching QAT mode is PreActResNet(deploy_exact=True, stream_int8=True),
whose edge requants (quant/ste.py requant_grid_ste) round code-for-code
like the INT graph's _requant_codes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.kernels.infer import (
    build_resnet20_int8,
    resnet20_int8_forward,
    residual_multipliers,
)


class TestInt8StreamGraph:
    def test_runs_and_differs_from_int16(self):
        _, (qp, x) = build_resnet20_int8(8)
        l16 = np.asarray(resnet20_int8_forward(qp, x))
        l8 = np.asarray(resnet20_int8_forward(qp, x, stream="int8"))
        assert l16.shape == l8.shape
        # different stream semantics -> different logits (not a no-op)
        assert not np.array_equal(l16, l8)
        assert np.isfinite(l8).all()

    def test_jit_eager_identical(self):
        """Bit-determinism: the int8-stream graph is exact-integer too."""
        _, (qp, x) = build_resnet20_int8(4)
        f = lambda q, x: resnet20_int8_forward(q, x, stream="int8")
        np.testing.assert_array_equal(
            np.asarray(jax.jit(f)(qp, x)), np.asarray(f(qp, x))
        )

    def test_rejects_stage_kernel_combo(self):
        _, (qp, x) = build_resnet20_int8(2)
        with pytest.raises(AssertionError):
            resnet20_int8_forward(
                qp, x, act_impl="poly", use_stage_kernel=True, stream="int8"
            )


@pytest.mark.slow
class TestStreamInt8QATParity:
    def test_stream_int8_model_matches_int_graph(self):
        """Random-init stream_int8 QAT forward vs the stream='int8' INT
        graph: every requant site (input AND shortcut) rounds
        code-for-code, so disagreement is bounded by f32 conv epilogue
        ulps at erf rounding ties."""
        from alignq_tpu.kernels.infer import convert_resnet20
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(
            bitW=8, abitW=8, method="ours", variant="int8",
            deploy_exact=True, stream_int8=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(4), x, train=False)
        logits_fq = np.asarray(model.apply(variables, x, train=False))
        qp = convert_resnet20(variables["params"], variables["batch_stats"])
        logits_i8 = np.asarray(resnet20_int8_forward(qp, x, stream="int8"))
        agree = (logits_fq.argmax(-1) == logits_i8.argmax(-1)).mean()
        assert agree >= 0.9

    def test_stream_int8_requires_deploy_exact(self):
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(bitW=8, abitW=8, method="ours", stream_int8=True)
        x = jnp.zeros((2, 32, 32, 3))
        with pytest.raises(AssertionError):
            model.init(jax.random.PRNGKey(0), x, train=False)
