"""FP32 'align' stage semantics (VERDICT.md round-1 item 7).

Reference: STAGE='align' is the DSAN default
(/root/reference/cdf_alignment/dsan_office/utils/options_office.py:26); under
it a 32-bit activation still passes through the CDF transform without
rounding (activation_quantize_fn.forward,
dsan_office/model/quantization.py:90-102 returns activation_cdf; the ADMM
twin cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:103-130
additionally applies the (2*Phi-1)*act_range affine for variant 'b').
"""

import jax
import jax.numpy as jnp
import numpy as np

from alignq_tpu.nn import QuantAct
from alignq_tpu.quant.fake_quant import act_cdf


def _x(shape=(4, 6), seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape)


class TestQuantActAlignStage:
    def test_align_at_32bit_is_cdf_transform_variant_b(self):
        x = _x()
        y = QuantAct(a_bit=32, stage="align", variant="b").apply({}, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(act_cdf(x, act_range=2.0, variant="b")),
            rtol=1e-6,
        )
        # variant 'b' lands in [-act_range, act_range]
        assert float(jnp.max(jnp.abs(y))) <= 2.0

    def test_align_at_32bit_is_raw_phi_variant_a(self):
        # dsan_office (non-ADMM) cdf returns raw Phi in [0,1]
        # (quantization.py:44-49,99)
        x = _x(seed=1)
        y = QuantAct(a_bit=32, stage="align", variant="a").apply({}, x)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(act_cdf(x, variant="a")), rtol=1e-6
        )
        assert 0.0 <= float(jnp.min(y)) and float(jnp.max(y)) <= 1.0

    def test_quant_stage_at_32bit_is_identity(self):
        x = _x(seed=2)
        y = QuantAct(a_bit=32, stage="quant").apply({}, x)
        assert (np.asarray(y) == np.asarray(x)).all()

    def test_align_below_32bit_unchanged(self):
        # stage only matters at a_bit==32 (reference branch structure)
        x = _x(seed=3)
        ya = QuantAct(a_bit=4, stage="align").apply({}, x)
        yq = QuantAct(a_bit=4, stage="quant").apply({}, x)
        assert (np.asarray(ya) == np.asarray(yq)).all()

    def test_align_no_corr_loss_at_32bit(self):
        # reference guard `method=='ours' and a_bit<32` -> no ADMM site at 32
        x = _x(seed=4)
        y, aux = QuantAct(a_bit=32, stage="align", admm=True).apply(
            {}, x, True, mutable=["admm_d"]
        )
        assert aux.get("admm_d", {}) == {}
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(act_cdf(x)), rtol=1e-6
        )

    def test_align_non_ours_method_identity(self):
        x = _x(seed=5)
        y = QuantAct(a_bit=32, stage="align", method="uniform").apply({}, x)
        assert (np.asarray(y) == np.asarray(x)).all()


class TestModelAlignPlumbing:
    def test_dsan_align_differs_from_quant_at_fp32(self):
        from alignq_tpu.models import DSAN

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        outs = {}
        for stage in ("quant", "align"):
            m = DSAN(arch="resnet18", num_classes=5, bottle_neck=False,
                     w_bit=32, a_bit=32, stage=stage)
            v = m.init(jax.random.PRNGKey(1), x)
            outs[stage] = np.asarray(m.apply(v, x))
        assert not np.allclose(outs["quant"], outs["align"])

    def test_daconfig_has_stage_field(self):
        from alignq_tpu.train.da import DAConfig

        assert DAConfig(stage="align").stage == "align"
