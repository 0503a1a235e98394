"""LMMD against the ACTUAL reference implementation.

admm/lmmd.py is a vectorized redesign of the reference's host class-loop
(dsan_office/utils/mmd.py guassian_kernel/lmmd + utils/Weight.py
cal_weight); until now it was verified against the builder's reading of
that math. This test imports the reference's own modules (no argparse
singleton — directly importable) and compares values on random inputs.

Environment shims (no semantics): `.cuda()` calls in the reference's lmmd
are made identity (CPU-only image), and the reference 'utils' package is
imported under sys.path manipulation that is undone afterwards.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/cdf_alignment/dsan_office"


@pytest.fixture()
def ref_mmd():
    saved_path = list(sys.path)
    saved_utils = sys.modules.get("utils")
    saved_cuda = torch.Tensor.cuda
    sys.path.insert(0, REF)
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU shim
    try:
        import utils.mmd as mmd  # noqa: PLC0415

        yield mmd
    finally:
        torch.Tensor.cuda = saved_cuda
        sys.path[:] = saved_path
        for mod in [m for m in sys.modules if m == "utils" or m.startswith("utils.")]:
            del sys.modules[mod]
        if saved_utils is not None:
            sys.modules["utils"] = saved_utils


class TestLMMDAgainstReferenceCode:
    def _case(self, seed, batch=16, feat=8, ncls=31):
        rng = np.random.RandomState(seed)
        s = rng.randn(batch, feat).astype(np.float32)
        t = rng.randn(batch, feat).astype(np.float32)
        ys = rng.randint(0, ncls, batch)
        t_logits = rng.randn(batch, ncls).astype(np.float32)
        t_soft = np.exp(t_logits) / np.exp(t_logits).sum(-1, keepdims=True)
        return s, t, ys, t_soft

    def test_matches_reference_lmmd(self, ref_mmd):
        from alignq_tpu.admm.lmmd import lmmd

        for seed in (0, 1, 2, 3):
            s, t, ys, t_soft = self._case(seed)
            want = float(ref_mmd.lmmd(
                torch.tensor(s), torch.tensor(t),
                torch.tensor(ys), torch.tensor(t_soft),
            ))
            got = float(lmmd(
                jnp.asarray(s), jnp.asarray(t), jnp.asarray(ys),
                jnp.asarray(t_soft), 31,
            ))
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6,
                                       err_msg=f"seed {seed}")

    def test_matches_reference_kernel(self, ref_mmd):
        """The multi-bandwidth Gaussian kernel alone (mmd.py:6-19)."""
        from alignq_tpu.admm.lmmd import gaussian_kernel

        s, t, _, _ = self._case(7)
        want = ref_mmd.guassian_kernel(torch.tensor(s), torch.tensor(t)).numpy()
        got = np.asarray(gaussian_kernel(jnp.asarray(s), jnp.asarray(t)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_empty_class_overlap_matches(self, ref_mmd):
        """cal_weight's no-shared-class branch (Weight.py:47-55 returns
        scalar zeros): both implementations must return 0 loss."""
        from alignq_tpu.admm.lmmd import lmmd

        rng = np.random.RandomState(9)
        s = rng.randn(8, 4).astype(np.float32)
        t = rng.randn(8, 4).astype(np.float32)
        ys = np.zeros(8, np.int64)  # source only class 0
        # target soft labels argmax to class 1 for every sample
        t_soft = np.full((8, 31), 1e-3, np.float32)
        t_soft[:, 1] = 1.0
        t_soft /= t_soft.sum(-1, keepdims=True)
        want = float(ref_mmd.lmmd(torch.tensor(s), torch.tensor(t),
                                  torch.tensor(ys), torch.tensor(t_soft)))
        got = float(lmmd(jnp.asarray(s), jnp.asarray(t), jnp.asarray(ys),
                         jnp.asarray(t_soft), 31))
        np.testing.assert_allclose(got, want, atol=1e-6)
