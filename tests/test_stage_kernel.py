"""Stage-interior megakernel (kernels/stage_kernel.py) correctness.

Interpret-mode (CPU) bit-equality against the pure-jnp NHWC reference and
against the production XLA formulation (kernels/infer.py helpers with the
poly act grid) — the megakernel must be indistinguishable from the graph it
replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alignq_tpu.kernels.convert import QConvInt8
from alignq_tpu.kernels.stage_kernel import (
    pack_block_weights,
    stage_identity_blocks,
    stage_identity_blocks_reference,
)


def _make_blocks(rng, c, nblk):
    blocks = []
    for _ in range(nblk):
        blk = {}
        for name in ("conv0", "conv1"):
            blk[name] = QConvInt8(
                jnp.asarray(rng.randint(-20, 20, (3, 3, c, c)), jnp.int8),
                jnp.asarray(rng.rand(c).astype(np.float32) * 1e-3),
                jnp.asarray((rng.rand(c).astype(np.float32) - 0.5) * 0.1),
            )
        blocks.append(blk)
    return blocks


@pytest.mark.slow
class TestStageKernel:
    @pytest.mark.parametrize(
        "c,h,w,batch,nblk,ms,chunk",
        [
            (16, 8, 8, 4, 2, (2, 3), 2),  # stage-1-like, multi-chunk
            (32, 4, 4, 4, 2, (2, 3), 4),  # stage-2-like, single chunk
            (16, 8, 8, 2, 1, (1,), 2),  # m=1 lossless requant
        ],
    )
    def test_bitwise_vs_reference(self, c, h, w, batch, nblk, ms, chunk):
        rng = np.random.RandomState(0)
        blocks = _make_blocks(rng, c, nblk)
        wt, scale, bias = pack_block_weights(blocks)
        stream = jnp.asarray(rng.randint(0, 300, (c, batch * h * w)), jnp.int16)
        ref = stage_identity_blocks_reference(stream, wt, scale, bias, ms, 127, w, h)
        got = stage_identity_blocks(
            stream, wt, scale, bias, ms, g=127, w_img=w, h_img=h, chunk_imgs=chunk
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    def test_bitwise_vs_production_xla_formulation(self):
        """Against the ACTUAL graph ops (infer.py helpers, poly act grid)."""
        from alignq_tpu.kernels.infer import _erfq_codes, _int8_conv, _requant_codes

        rng = np.random.RandomState(1)
        c, h, w, batch = 16, 8, 8, 4
        ms, g = (1, 2), 127
        blocks = _make_blocks(rng, c, len(ms))
        wt, scale, bias = pack_block_weights(blocks)

        x = jnp.asarray(rng.randint(0, 300, (batch, h, w, c)), jnp.int16)

        out_c = x
        for blk, m in zip(blocks, ms):
            x8 = _requant_codes(out_c, m, g)
            h0 = _int8_conv(x8, blk["conv0"], 1, 1)
            r0 = jnp.maximum(_erfq_codes(h0, 8, "poly"), 0)
            h1 = _int8_conv(r0.astype(jnp.int8), blk["conv1"], 1, 1)
            a1 = _erfq_codes(h1, 8, "poly").astype(jnp.int16)
            out_c = jnp.maximum(a1 + out_c, 0)

        stream = x.transpose(3, 0, 1, 2).reshape(c, -1)
        got = stage_identity_blocks(
            stream, wt, scale, bias, ms, g=g, w_img=w, h_img=h, chunk_imgs=2
        )
        got_nhwc = np.asarray(got).reshape(c, batch, h, w).transpose(1, 2, 3, 0)
        np.testing.assert_array_equal(np.asarray(out_c), got_nhwc)

    def test_e2e_forward_agreement(self):
        """Full resnet20 forward, XLA-poly vs megakernel: integer-exact ops
        with ~1e-5 f32-FMA tie flips per act site (module docstring). On a
        RANDOM-INIT net those flips cascade through 21 sites into near-tied
        logits, so this only bounds the logit drift; the production-strength
        evidence is the trained-model export run (tools/export_int8.py
        --cdf_impl poly --deploy_exact --stage_kernel: 0.00 pts delta,
        100.00% prediction agreement) — random-init argmax agreement hides
        or amplifies what matters (CLAUDE.md invariant)."""
        from alignq_tpu.kernels.infer import build_resnet20_int8, resnet20_int8_forward

        _, (qp, x) = build_resnet20_int8(8)
        a = np.asarray(resnet20_int8_forward(qp, x, act_impl="poly"))
        b = np.asarray(
            resnet20_int8_forward(qp, x, act_impl="poly", use_stage_kernel=True)
        )
        assert np.abs(a - b).max() < 0.5  # few flipped codes x tiny weights
        assert (a.argmax(-1) == b.argmax(-1)).mean() >= 0.75

    def test_a4_grid(self):
        rng = np.random.RandomState(2)
        c, h, w, batch, g = 16, 8, 8, 2, 7
        blocks = _make_blocks(rng, c, 1)
        wt, scale, bias = pack_block_weights(blocks)
        stream = jnp.asarray(rng.randint(0, 4 * g, (c, batch * h * w)), jnp.int16)
        ref = stage_identity_blocks_reference(stream, wt, scale, bias, (2,), g, w, h)
        got = stage_identity_blocks(
            stream, wt, scale, bias, (2,), g=g, w_img=w, h_img=h, chunk_imgs=2
        )
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
