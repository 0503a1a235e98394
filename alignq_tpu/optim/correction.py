"""The AlignQ PDF-corrected gradient rule as an optax transformation.

Reference: SGD.step in
/root/reference/cdf_alignment/resnet-20-cifar-10/utils/optimizer.py:196-262
with helpers sigmoid_d / transform at optimizer.py:6-13:

    T(c)      = ((c + 0.5) * (2^bitW - 1) mod 1) * lam2 * 2      # bin phase
    sigma'(x) = sigmoid(x) * (1 - sigmoid(x)) * lam              # smooth d(round)
    g        <- g * sigma'(T(c)) * pdf(w)                        # correction

where c = weight_cdf and pdf = 2*phi(w) are the CDF/PDF of the weight under
its own N(mean(w), std(w)) fit, harvested from the live modules in the
reference (main.py:295-309) and recomputed functionally here — identical
values because the optimizer runs on the same params the forward used.

Ordering: the correction applies AFTER the momentum/weight-decay update
(optimizer.py:216-229 compute the momentum buffer first, :231-249 then
correct), so this transform is chained after optax.trace.

Committed-state note (documented, not replicated): the reference assigns the
corrected gradient to `p.grad.data` but updates the parameter with the
*uncorrected* momentum buffer (optimizer.py:249-251), and `zero_grad`
discards p.grad next step — as committed the correction is a no-op. We
implement the paper's intended rule (update with the corrected gradient);
`apply_to_update=False` reproduces the committed no-op behavior for ablation.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from alignq_tpu.quant.cdf import cdf_transform, tensor_stats


def correction_factor(
    w: jax.Array, w_bit: int, lam: float, lam2: float, channelwise: bool = False
) -> jax.Array:
    """sigma'(T(c)) * pdf(w) for a weight tensor (optimizer.py:234-236).

    channelwise must match the quantizer's stats mode so the correction
    evaluates the same CDF the forward used."""
    if channelwise:
        from alignq_tpu.quant.cdf import channel_stats

        mean, std = channel_stats(w)
    else:
        mean, std = tensor_stats(w)
    # weight_cdf as stored by the canonical variant-b quantizer
    # (cdf_alignment_admm/.../quantization.py:78): c = 2*Phi(w) - 1.
    c, pdf = cdf_transform(w, mean, std, affine=True)
    t = jnp.mod((c + 0.5) * float(2**w_bit - 1), 1.0) * lam2 * 2.0
    sig = jax.nn.sigmoid(t)
    approx = sig * (1.0 - sig) * lam
    return approx * pdf


class AlignQCorrectionState(NamedTuple):
    pass


def scale_by_alignq_correction(
    w_bit: int,
    lam: float = 1.0,
    lam2: float = 4.0,
    mask: Any = None,
    apply_to_update: bool = True,
    channelwise: bool = False,
) -> optax.GradientTransformation:
    """Multiply (masked) updates by the AlignQ analytic correction.

    mask: pytree of bools matching params (True = corrected leaf), a callable
    params -> bool pytree, or None — which corrects every WEIGHT-LIKE leaf
    (ndim >= 2): 1-D/0-D leaves (biases, BN scale/shift) are never
    CDF-quantized, and on a constant leaf (zero-init bias, ones-init BN
    scale) tensor_stats' std is 0, so the correction there is NaN by
    construction. Defaults lam=1, lam2=4 from reference utils/options.py:85-89.
    """
    if w_bit >= 32 or not apply_to_update:
        return optax.identity()

    def init_fn(params):
        del params
        return AlignQCorrectionState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("scale_by_alignq_correction requires params")
        m = mask(params) if callable(mask) else mask

        def correct(u, w, flagged):
            if not flagged:
                return u
            return u * correction_factor(w, w_bit, lam, lam2, channelwise)

        if m is None:
            m = jax.tree.map(lambda w: jnp.ndim(w) >= 2, params)
        new_updates = jax.tree.map(correct, updates, params, m)
        return new_updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def build_correction_mask(
    params: Any,
    exclude: tuple[str, ...] = (),
    predicate: Callable[[tuple, Any], bool] | None = None,
) -> Any:
    """Boolean mask over params selecting quantized conv kernels.

    Mirrors the reference's harvesting rule (main.py:295-300): every param
    whose name contains 'conv' and 'weight' — i.e. 4-D conv kernels — minus
    an exclusion list (idx[1:] drops the stem conv for ResNet; DenseNet /
    MobileNet include all convs, see SURVEY.md section 7 hard-part 1).

    exclude: path-prefix strings like 'conv0' matched against the
    '/'-joined param path.
    """

    def default_pred(path: tuple, leaf) -> bool:
        keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(k) for k in keys)
        if keys and str(keys[-1]) != "kernel":
            return False
        if getattr(leaf, "ndim", 0) != 4:
            return False
        # exclusion is a path prefix from the root (e.g. the stem 'conv0'),
        # NOT a substring — 'layers_0/conv0' must stay included.
        return not any(joined == e or joined.startswith(e + "/") for e in exclude)

    pred = predicate or default_pred
    return jax.tree_util.tree_map_with_path(pred, params)
