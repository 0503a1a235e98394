"""Baseline quantizers: uniform, DoReFa, LSQ, APoT, LLSQ, BWN/BWNF.

Pure-function ports of the reference baseline quantizer families
(/root/reference/cdf_alignment_admm/resnet-20-cifar-10/model/quantization_{uniform,
dorefa,lsq,apot,llsq,bwn,bwnf}.py). Learnable parameters (LSQ step size,
APoT/LLSQ clip values) are passed in explicitly; the flax modules in
alignq_tpu/nn own them.

All custom backward rules are expressed with jax.custom_vjp or STE identities
so everything stays jit/grad-compatible and fuses on the VPU.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

from alignq_tpu.quant.ste import round_ste, uniform_quantize


# --------------------------------------------------------------------------
# Uniform (quantization_uniform.py:37-67)
# --------------------------------------------------------------------------

def uniform_weight(w: jax.Array, w_bit: int) -> jax.Array:
    """uniform baseline: w_bit==1 -> mean|w|-scaled sign; else raw grid."""
    if w_bit == 32:
        return w
    if w_bit == 1:
        e = jax.lax.stop_gradient(jnp.mean(jnp.abs(w)))
        return uniform_quantize(w / e, 1) * e
    return uniform_quantize(w, w_bit)


def uniform_act(a: jax.Array, a_bit: int) -> jax.Array:
    """clamp to [0,1] then quantize (quantization_uniform.py:60-66)."""
    if a_bit == 32:
        return a
    return uniform_quantize(jnp.clip(a, 0.0, 1.0), a_bit)


# --------------------------------------------------------------------------
# DoReFa (quantization_dorefa.py:37-71)
# --------------------------------------------------------------------------

def dorefa_weight(w: jax.Array, w_bit: int) -> jax.Array:
    if w_bit == 32:
        return w
    if w_bit == 1:
        e = jax.lax.stop_gradient(jnp.mean(jnp.abs(w)))
        return uniform_quantize(w / e, 1) * e
    t = jnp.tanh(w)
    max_w = jax.lax.stop_gradient(jnp.max(jnp.abs(t)))
    u = t / (2.0 * max_w) + 0.5
    return max_w * (2.0 * uniform_quantize(u, w_bit) - 1.0)


dorefa_act = uniform_act  # identical in the reference (dorefa.py:65-71)


# --------------------------------------------------------------------------
# BWN / BWNF (quantization_bwn.py:34-48, quantization_bwnf.py:34-48)
# --------------------------------------------------------------------------

def bwn_weight(w: jax.Array, w_bit: int) -> jax.Array:
    """Binary-Weight-Net: per-tensor alpha = mean|w|."""
    if w_bit == 32:
        return w
    alpha = jax.lax.stop_gradient(jnp.mean(jnp.abs(w)))
    return alpha * uniform_quantize(w, w_bit)


def bwnf_weight(w: jax.Array, w_bit: int) -> jax.Array:
    """BWN with per-output-filter alpha.

    Reference (OIHW) reduces over dims (-1,-2,-3); our conv kernels are HWIO,
    so reduce over (0, 1, 2) keeping the output-channel axis.
    """
    if w_bit == 32:
        return w
    alpha = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(w), axis=tuple(range(w.ndim - 1)), keepdims=True)
    )
    return alpha * uniform_quantize(w, w_bit)


# --------------------------------------------------------------------------
# LSQ (quantization_lsq.py:18-63)
# --------------------------------------------------------------------------

def _grad_scale(x: jax.Array, scale) -> jax.Array:
    """Value of x, gradient scaled by `scale` (lsq.py:37-43)."""
    return jax.lax.stop_gradient(x - x * scale) + x * scale


def lsq_quantize(x: jax.Array, s: jax.Array, bits: int, *, is_activation: bool) -> jax.Array:
    """Learned-step-size quantization (lsq.py:52-63).

    s is the learnable per-tensor step size; its gradient is scaled by
    1/sqrt(numel * Qp) (the LSQ grad-scale trick).
    """
    if bits == 32:
        return x
    if is_activation:
        qn, qp = 0, 2**bits - 1
    else:
        qn, qp = -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    scale_factor = 1.0 / float(np.sqrt(x.size * qp))
    scale = _grad_scale(s, scale_factor)
    y = jnp.clip(x / scale, qn, qp)
    return round_ste(y) * scale


def lsq_init_step(x: jax.Array, bits: int, *, is_activation: bool) -> jax.Array:
    """Data-dependent init of s (lsq.py:33-35): 2*mean|x|/sqrt(Qp)."""
    qp = (2**bits - 1) if is_activation else (2 ** (bits - 1) - 1)
    return jnp.mean(jnp.abs(x)) * 2.0 / float(np.sqrt(qp))


# --------------------------------------------------------------------------
# APoT (quantization_apot.py:15-165)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def build_power_value(b: int = 2, additive: bool = True) -> np.ndarray:
    """Additive powers-of-two level set, clip threshold 1 (apot.py:15-60)."""
    base_a, base_b, base_c = [0.0], [0.0], [0.0]
    if additive:
        if b == 2:
            for i in range(3):
                base_a.append(2 ** (-i - 1))
        elif b == 4:
            for i in range(3):
                base_a.append(2 ** (-2 * i - 1))
                base_b.append(2 ** (-2 * i - 2))
        elif b == 6:
            for i in range(3):
                base_a.append(2 ** (-3 * i - 1))
                base_b.append(2 ** (-3 * i - 2))
                base_c.append(2 ** (-3 * i - 3))
        elif b == 3:
            for i in range(3):
                if i < 2:
                    base_a.append(2 ** (-i - 1))
                else:
                    base_b.append(2 ** (-i - 1))
                    base_a.append(2 ** (-i - 2))
        elif b == 5:
            for i in range(3):
                if i < 2:
                    base_a.append(2 ** (-2 * i - 1))
                    base_b.append(2 ** (-2 * i - 2))
                else:
                    base_c.append(2 ** (-2 * i - 1))
                    base_a.append(2 ** (-2 * i - 2))
                    base_b.append(2 ** (-2 * i - 3))
    else:
        for i in range(2**b - 1):
            base_a.append(2 ** (-i - 1))
    values = sorted(set(a + bb + c for a, bb, c in itertools.product(base_a, base_b, base_c)))
    values = np.asarray(values, dtype=np.float32)
    # normalize exactly as the reference does (apot.py:58-59:
    # values.mul(1.0 / torch.max(values)) — an f32 RECIPROCAL MULTIPLY, not
    # a division): at b=5 the two differ by 1 f32 ulp on some levels, and
    # tools/reference_parity_quantizers.py pins the table bit-for-bit
    return values * np.float32(1.0 / values.max())


def _project_to_levels(x: jax.Array, levels: jax.Array) -> jax.Array:
    """Nearest-level projection (apot.py:70-77). levels is a small static set,
    so the |x - l| sweep is a fused VPU broadcast, not a gather."""
    d = jnp.abs(x[..., None] - levels)
    idx = jnp.argmin(d, axis=-1)
    return levels[idx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def apot_weight_quant(w: jax.Array, alpha: jax.Array, bits: int, power: bool) -> jax.Array:
    """APoT weight projection with learnable clip alpha (_pq, apot.py:79-103).

    Input w is assumed pre-normalized by (mean, std) as in apot.py:120-122.
    """
    wa = w / alpha
    wc = jnp.clip(wa, -1.0, 1.0)
    sign = jnp.sign(wc)
    wabs = jnp.abs(wc)
    if power:
        levels = jnp.asarray(build_power_value(bits, True))
        wq = _project_to_levels(wabs, levels) * sign
    else:
        n = float(2**bits - 1)
        wq = jnp.round(wabs * n) / n * sign
    return wq * alpha


def _apot_w_fwd(w, alpha, bits, power):
    out = apot_weight_quant(w, alpha, bits, power)
    wa = w / alpha
    wq = out / alpha
    return out, (wa, wq)


def _apot_w_bwd(bits, power, res, g):
    # apot.py:94-101: grad for w is unclipped identity; grad for alpha is
    # sign outside the clip region, (wq - wa) inside.
    wa, wq = res
    outside = (jnp.abs(wa) > 1.0).astype(g.dtype)
    grad_alpha = jnp.sum(g * (jnp.sign(wa) * outside + (wq - wa) * (1.0 - outside)))
    return g, grad_alpha.reshape(())


apot_weight_quant.defvjp(_apot_w_fwd, _apot_w_bwd)


def apot_weight(w: jax.Array, alpha: jax.Array, w_bit: int) -> jax.Array:
    """Full APoT weight path (apot.py:106-124): normalize then project.

    Reference uses effective bits = w_bit - 1 and power mode iff w_bit > 2.
    mean/std are detached (apot.py:120-121 uses .data)."""
    if w_bit == 32:
        return w
    b = w_bit - 1
    power = w_bit > 2
    mean = jax.lax.stop_gradient(jnp.mean(w))
    std = jax.lax.stop_gradient(jnp.std(w, ddof=1))
    return apot_weight_quant((w - mean) / std, alpha, b, power)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def apot_act_quant(a: jax.Array, alpha: jax.Array, bits: int, power: bool) -> jax.Array:
    """APoT activation projection (_uq, apot.py:142-163); clamp max=1 only."""
    aa = a / alpha
    ac = jnp.minimum(aa, 1.0)
    if power:
        levels = jnp.asarray(build_power_value(bits, True))
        aq = _project_to_levels(ac, levels)
    else:
        n = float(2**bits - 1)
        aq = jnp.round(ac * n) / n
    return aq * alpha


def _apot_a_fwd(a, alpha, bits, power):
    out = apot_act_quant(a, alpha, bits, power)
    aa = a / alpha
    aq = out / alpha
    return out, (aa, aq)


def _apot_a_bwd(bits, power, res, g):
    aa, aq = res
    over = (aa > 1.0).astype(g.dtype)
    grad_alpha = jnp.sum(g * (over + (aq - aa) * (1.0 - over)))
    grad_a = g * (1.0 - over)
    return grad_a, grad_alpha.reshape(())


apot_act_quant.defvjp(_apot_a_fwd, _apot_a_bwd)


# --------------------------------------------------------------------------
# LLSQ (quantization_llsq.py:17-229)
# --------------------------------------------------------------------------

def quan_alpha(alpha: jax.Array, bits: int) -> jax.Array:
    """Quantize the scale itself to `bits` (llsq.py:132-138)."""
    if bits == 32:
        return alpha
    q_code = bits - jnp.ceil(jnp.log2(jnp.max(alpha)) + 1 - 1e-5)
    lo, hi = -(2.0 ** (bits - 1)), 2.0 ** (bits - 1) - 1
    return jnp.clip(jnp.round(alpha * 2.0**q_code), lo, hi) / 2.0**q_code


def _llsq_round(x, alpha, pwr, lo):
    return jnp.clip(jnp.round(x / alpha), lo, pwr - 1) * alpha


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def llsq_weight_quant(w: jax.Array, alpha: jax.Array, bit: int, per_channel: bool) -> jax.Array:
    """LLSQ weight rounding (RoundFn_LLSQ, llsq.py:17-59).

    alpha is per-output-channel shaped (1,1,1,Cout) for HWIO conv kernels
    (reference OIHW uses (Cout,1,1,1)); alpha is 16-bit-quantized on the fly.
    """
    pwr = 2 ** (bit - 1)
    a = quan_alpha(alpha, 16)
    return _llsq_round(w, a, pwr, -pwr)


def _llsq_w_fwd(w, alpha, bit, per_channel):
    return llsq_weight_quant(w, alpha, bit, per_channel), (w, quan_alpha(alpha, 16))


def _llsq_w_bwd(bit, per_channel, res, g):
    # Octave search (llsq.py:33-52): compare reconstruction error at
    # alpha/2, alpha, alpha*2; grad_alpha = -alpha^2 * argmin_offset.
    w, a = res
    pwr = 2 ** (bit - 1)
    el_q = _llsq_round(w, a / 2, pwr, -pwr)
    em_q = _llsq_round(w, a, pwr, -pwr)
    er_q = _llsq_round(w, a * 2, pwr, -pwr)
    if per_channel:
        axes = tuple(range(w.ndim - 1))  # reduce HWI, keep Cout
        el = jnp.sum((w - el_q) ** 2, axis=axes)
        em = jnp.sum((w - em_q) ** 2, axis=axes)
        er = jnp.sum((w - er_q) ** 2, axis=axes)
        d_better = jnp.argmin(jnp.stack([el, em, er]), axis=0) - 1
        grad_alpha = -(a**2) * d_better.astype(a.dtype).reshape(a.shape)
    else:
        el = jnp.sum((w - el_q) ** 2)
        em = jnp.sum((w - em_q) ** 2)
        er = jnp.sum((w - er_q) ** 2)
        d_better = jnp.argmin(jnp.stack([el, em, er])) - 1
        grad_alpha = -(a**2) * d_better.astype(a.dtype)
    return g, grad_alpha


llsq_weight_quant.defvjp(_llsq_w_fwd, _llsq_w_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def llsq_act_quant(a: jax.Array, alpha: jax.Array, bit: int, signed: bool) -> jax.Array:
    """LLSQ activation rounding (RoundFn_act, llsq.py:154-195)."""
    pwr = 2 ** (bit - 1)
    lo = -pwr if signed else 0
    return _llsq_round(a, alpha, pwr, lo)


def _llsq_a_fwd(a, alpha, bit, signed):
    return llsq_act_quant(a, alpha, bit, signed), (a, alpha)


def _llsq_a_bwd(bit, signed, res, g):
    x, alpha = res
    pwr = 2 ** (bit - 1)
    lo = -pwr if signed else 0
    el_q = _llsq_round(x, alpha / 2, pwr, lo)
    em_q = _llsq_round(x, alpha, pwr, lo)
    er_q = _llsq_round(x, alpha * 2, pwr, lo)
    el = jnp.sum((x - el_q) ** 2)
    em = jnp.sum((x - em_q) ** 2)
    er = jnp.sum((x - er_q) ** 2)
    d_better = jnp.argmin(jnp.stack([el, em, er])) - 1
    grad_alpha = -(alpha**2) * d_better.astype(alpha.dtype)
    if signed:
        mask = (x >= -pwr * alpha) & (x <= (pwr - 1) * alpha)
    else:
        mask = (x >= 0) & (x <= (pwr * 2 - 1) * alpha)
    return g * mask.astype(g.dtype), grad_alpha


llsq_act_quant.defvjp(_llsq_a_fwd, _llsq_a_bwd)
