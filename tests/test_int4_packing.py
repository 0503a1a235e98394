"""INT4 weight packing (VERDICT.md round-1 item 5): two 4-bit codes per
byte in HBM/disk, bit-identical outputs vs unpacked, artifact bytes ~halve.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from alignq_tpu.kernels.artifact import load_int8_artifact, save_int8_artifact
from alignq_tpu.kernels.convert import (
    pack_int4,
    pack_qparams_int4,
    packed_int4_forward,
    unpack_int4,
    unpack_qparams_int4,
)


class TestNibbleCodec:
    def test_roundtrip_all_codes(self):
        codes = jnp.array(
            [[a, b] for a in range(-8, 8) for b in range(-8, 8)], jnp.int8
        )
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(pack_int4(codes))), np.asarray(codes)
        )

    def test_roundtrip_random_4d(self):
        rng = np.random.RandomState(0)
        codes = rng.randint(-7, 8, (3, 3, 16, 32)).astype(np.int8)
        packed = pack_int4(jnp.asarray(codes))
        assert packed.shape == (3, 3, 16, 16) and packed.dtype == jnp.uint8
        np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), codes)

    def test_odd_last_axis_raises(self):
        with pytest.raises(ValueError, match="even"):
            pack_int4(jnp.zeros((4, 3), jnp.int8))


@pytest.mark.slow
class TestPackedResnet20:
    def _build(self):
        from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
        from alignq_tpu.models import resnet20_quant

        model = resnet20_quant(bitW=4, abitW=4, method="ours", variant="int8")
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(1), x, train=False)
        qp = convert_resnet20(
            variables["params"], variables["batch_stats"],
            weight_bits=4, act_bits=4,
        )
        return qp, x, resnet20_int8_forward

    def test_bit_identical_outputs(self):
        # compare like-for-like execution modes: jit-vs-eager of the SAME
        # graph differs (fusion shifts h by ulps and round() flips a code —
        # a property of any int graph, not of packing)
        qp, x, fwd = self._build()
        packed = pack_qparams_int4(qp)

        ref_eager = np.asarray(fwd(qp, x, act_bits=4))
        out_eager = np.asarray(packed_int4_forward(fwd, packed, x, act_bits=4))
        np.testing.assert_array_equal(out_eager, ref_eager)

        import functools

        ref_jit = np.asarray(jax.jit(functools.partial(fwd, act_bits=4))(qp, x))
        out_jit = np.asarray(
            jax.jit(
                lambda q, xx: packed_int4_forward(fwd, q, xx, act_bits=4)
            )(packed, x)
        )
        np.testing.assert_array_equal(out_jit, ref_jit)

    def test_packed_kernels_halve_and_roundtrip(self, tmp_path):
        qp, x, fwd = self._build()
        packed = pack_qparams_int4(qp)

        def kernel_bytes(tree):
            return sum(
                leaf.size
                for leaf in jax.tree.leaves(tree)
                if getattr(leaf, "dtype", None) in (jnp.int8, jnp.uint8)
                and getattr(leaf, "ndim", 0) == 4
            )

        assert kernel_bytes(packed) * 2 == kernel_bytes(qp)

        # artifact roundtrip: save packed (uncompressed npz so byte counts
        # reflect storage), reload, unpack, bit-identical forward
        p_packed = str(tmp_path / "packed.npz")
        p_plain = str(tmp_path / "plain.npz")
        import numpy as _np

        def save_raw(path, tree):
            # same key scheme as kernels/artifact.py, but UNcompressed so
            # byte counts reflect raw storage
            flat = {}
            for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
                key = "/".join(
                    str(getattr(pp, "key", getattr(pp, "idx", getattr(pp, "name", pp))))
                    for pp in kp
                )
                flat[key] = _np.asarray(leaf)
            _np.savez(path, **flat)

        save_raw(p_packed, packed)
        save_raw(p_plain, qp)
        # weight-dominated models: packed artifact is meaningfully smaller
        assert os.path.getsize(p_packed) < 0.75 * os.path.getsize(p_plain)

        restored, _ = load_int8_artifact(p_packed, packed)
        out = np.asarray(fwd(unpack_qparams_int4(restored), x, act_bits=4))
        ref = np.asarray(fwd(qp, x, act_bits=4))
        np.testing.assert_array_equal(out, ref)

    def test_artifact_helper_roundtrip(self, tmp_path):
        qp, x, fwd = self._build()
        packed = pack_qparams_int4(qp)
        path = str(tmp_path / "art.npz")
        save_int8_artifact(path, packed, meta={"bits": 4, "packed": 1})
        restored, meta = load_int8_artifact(path, packed)
        assert int(meta["bits"]) == 4
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(packed)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
