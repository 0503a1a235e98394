"""Batch-correlation matrices for ADMM correlation preservation.

Reference: `corr(x, y)` in
/root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/quantization.py:134-137
(and the eps-guarded office twin at
/root/reference/cdf_alignment_admm/dann_office/model/quantization.py:158-161).

The B x B correlation matrix is the one cross-batch-coupled computation in
AlignQ (SURVEY.md section 5): under data parallelism the default is a
per-shard B_local x B_local matrix (block-diagonal approximation, zero
communication); alignq_tpu/dist/corr.py provides the all-gathered exact mode.

TPU shape note: x is (B, F) with F = C*H*W; the two matmuls are MXU work of
size B x F x B. Standardization fuses into the matmul producers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _safe_std(x: jax.Array) -> jax.Array:
    """Column std (ddof=1) whose gradient is 0 — not NaN — for columns that
    are exactly constant across the batch.

    jnp.std is sqrt(var); d(sqrt)/d(var) = 1/(2*sqrt(var)) is inf at var=0,
    and inf * 0 cotangent = NaN. Constant columns happen in practice: low-bit
    quantized activations tie exactly, and per-shard corr (small B_local,
    dist/corr.py 'local' mode) makes that common — the first training step
    then poisons the params with NaNs. Double-where keeps forward values
    identical to jnp.std while routing the 0-variance branch around the
    sqrt. (The reference's torch .std() has the same backward blow-up; it
    just never runs batches small enough to hit it.)
    """
    var = jnp.var(x, axis=0, ddof=1)
    nz = var > 0.0
    return jnp.where(nz, jnp.sqrt(jnp.where(nz, var, 1.0)), 0.0)


def corr(x: jax.Array, y: jax.Array, *, eps: float = 0.0) -> jax.Array:
    """Pearson-style batch correlation: standardize columns, X @ Y^T / F.

    Matches reference quantization.py:134-137 exactly when eps == 0; the
    dann_office variant passes eps=1e-5 on the std (quantization.py:158-161).
    """
    x_std = (x - jnp.mean(x, axis=0)) / (_safe_std(x) + eps)
    y_std = (y - jnp.mean(y, axis=0)) / (_safe_std(y) + eps)
    # HIGHEST precision: on TPU the default f32 matmul uses bf16 passes;
    # the B x B discrepancies are small differences of near-equal matrices,
    # so full f32 accumulation matters (and the matmul is tiny: B x F x B).
    return (
        jnp.matmul(
            x_std,
            y_std.T,
            preferred_element_type=x_std.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
        / x_std.shape[1]
    )


def corr_discrepancy(x_feat: jax.Array, x_trans_feat: jax.Array, *, eps: float = 0.0) -> jax.Array:
    """D = corr(T(x)) - corr(x) (admm quantization.py:115-122).

    Inputs are the flattened (B, C*H*W) activations before and after the CDF
    transform; the result is the B x B discrepancy fed to the ADMM loss.
    """
    c = corr(x_feat, x_feat, eps=eps)
    c_trans = corr(x_trans_feat, x_trans_feat, eps=eps)
    return c_trans - c
