"""Pallas stage-interior megakernel for the INT8 PreAct ResNet graphs.

Motivation (tools/int8_breakdown.py, batch 1024): with the act transform
ablated the e2e graph still takes 1.74 ms while its convs sum to ~0.5 ms —
the rest is the residual stream's HBM round-trips: every requant / quant /
relu / add materializes a 16-33 MB tensor because XLA cannot fuse elementwise
producers INTO a convolution's input. This kernel keeps a whole stage's
identity blocks resident in VMEM: HBM traffic collapses to one stream read
+ one stream write per stage (~2x less than a single block's traffic in the
XLA graph).

Design (TPU-first):
- Activations live TRANSPOSED as (C, M) with M = batch*H*W — C is tiny
  (16/32/64), so the (M, C) layout XLA uses wastes 50-87% of the 128-wide
  VPU lanes on every elementwise op; with M in lanes every quantizer /
  stream op runs full-lane.
- 3x3 conv = masked lane-roll im2col: tap (dy, dx) of the padded conv is a
  lane shift of the (C, M) buffer by (dy-1)*W + (dx-1) with out-of-image
  columns zeroed (pad-1 semantics; image-crossing wraps are masked by the
  same bounds test because chunks are whole images). The 9 taps stack into
  an X_col (9C, M) scratch, then ONE int8 dot (C, 9C) @ (9C, M) -> (C, M)
  int32 per conv — the same 2-K-tile MXU work XLA's conv emitter does.
- The epilogue (dequant scale/bias, act-quant codes, relu, residual add,
  requant) is the exact arithmetic of kernels/infer.py, f32-op-for-op
  (act_impl='poly' uses the same ERF_SQRT2_POLY Horner). On the real chip
  the kernel is BIT-IDENTICAL to the XLA formulation (0/16.7M code
  mismatches, tools/stage_kernel_bench.py); under CPU interpret mode the
  f32 epilogue can differ by 1 ulp where the two compilers make different
  FMA-contraction choices (~1e-5 of elements at rounding ties).

The kernel covers runs of stride-1 (identity) blocks; stage-boundary
stride-2 blocks stay in XLA (strided taps would need lane gathers). I/O is
(C, M) — resnet20_int8_forward transposes at stage boundaries.

HARDWARE VERDICT (v5e, batch 1024, stage-1 shapes, value-fetch timing):
XLA 1.40 ms vs this kernel 2.05 ms (0.68x) — XLA stays the production
default. The loss is structural on this backend: Mosaic cannot legalize
i8 lane rotates ("Rotate with non-32-bit data") or i8 vector arithmetic
(arith.maxsi), so every tap shift runs on int32 — 4x the roll bytes the
design budgeted — and the 32-bit stack also caps chunk_imgs at 8 (16 MB
scoped VMEM), an 8x smaller block than planned. The HBM-traffic saving
the kernel exists for (~1 read + 1 write per stage vs per-op round trips)
is real but smaller than the forced VPU roll cost at C=16. Kept as a
bit-exact tested fallback + the e2e A/B stays reproducible
(use_stage_kernel=True).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from alignq_tpu.kernels.quantize import interpret_mode
from alignq_tpu.quant.cdf import ERF_SQRT2_POLY

TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _poly_codes(h: jax.Array, g: float) -> jax.Array:
    """round(poly_cdf(h) * g) codes — f32-op-for-op identical to
    kernels/infer.py _erfq_codes(impl='poly') (same clamp, same Horner
    order, same round/clip), so XLA and Pallas produce the same bits.

    Returned as int32, not int8: Mosaic cannot legalize arithmetic on i8
    vectors on this backend (arith.maxsi on vector<...xi8> fails to
    compile), so every in-kernel value stays 32-bit and the only narrow
    type is the xcol scratch (the i32->i8 pack on store is legal) feeding
    the int8 MXU dot."""
    zc = jnp.clip(h, -3.0, 3.0)
    u = zc * zc
    acc = jnp.asarray(ERF_SQRT2_POLY[-1], h.dtype)
    for c in ERF_SQRT2_POLY[-2::-1]:
        acc = acc * u + c
    c = zc * acc
    return jnp.clip(jnp.round(c * g), -g, g).astype(jnp.int32)


def _requant(k32: jax.Array, m: int, g: int) -> jax.Array:
    """kernels/infer.py _requant_codes on an int32 (C, M) block (i32 out;
    the i8 pack happens at the xcol store — see _poly_codes note)."""
    if m == 1:
        return jnp.clip(k32, 0, g)
    return jnp.clip((2 * k32 + m) // (2 * m), 0, g)


def _build_xcol(xcol_ref, x8, w_img: int, h_img: int, col_iota):
    """Write the 9 masked lane-rolled taps of x8 (C, M) into xcol (9C, M).

    Column m maps to (y, x) = ((m // w_img) % h_img, m % w_img); tap
    (dy, dx) reads input pixel (y + dy - 1, x + dx - 1), i.e. lane m + s
    with s = (dy-1)*w_img + (dx-1), valid only inside the image (zero
    padding elsewhere — which also kills image-crossing wraps).
    """
    c = x8.shape[0]
    y_idx = (col_iota // w_img) % h_img
    x_idx = col_iota % w_img
    mc = x8.shape[1]
    # Mosaic's lane rotate is only implemented for 32-bit element types
    # (tpu.dynamic_rotate on i8 fails to compile on the real chip:
    # "Rotate with non-32-bit data"); x arrives as int32 codes and is
    # packed to int8 only on the masked store.
    x32 = x8
    for t, (dy, dx) in enumerate(TAPS):
        s = (dy - 1) * w_img + (dx - 1)
        # circular roll so column m reads x8[m + s]; pltpu.roll requires a
        # non-negative shift, and (-s) % mc is the same rotation. Wrapped
        # columns are zeroed by the bounds mask below.
        shifted = pltpu.roll(x32, (-s) % mc, axis=1) if s != 0 else x32
        valid = (
            (y_idx + (dy - 1) >= 0)
            & (y_idx + (dy - 1) < h_img)
            & (x_idx + (dx - 1) >= 0)
            & (x_idx + (dx - 1) < w_img)
        )
        xcol_ref[c * t : c * (t + 1), :] = jnp.where(valid, shifted, 0).astype(
            jnp.int8
        )


def _stage_body(
    stream_ref,  # (C, Mc) int16 — residual code stream in
    wt_ref,  # (n_blocks, 2, C, 9C) int8 — W^T per conv
    scale_ref,  # (n_blocks, 2, C, 1) f32
    bias_ref,  # (n_blocks, 2, C, 1) f32
    out_ref,  # (C, Mc) int16 — stream out
    xcol_ref,  # scratch (9C, Mc) int8
    *,
    ms: Sequence[int],
    g: int,
    w_img: int,
    h_img: int,
):
    c = stream_ref.shape[0]
    mc = stream_ref.shape[1]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, mc), 1)
    out_c = stream_ref[:].astype(jnp.int32)  # codes, >= 0

    for b, m in enumerate(ms):
        x8 = _requant(out_c, m, g)
        _build_xcol(xcol_ref, x8, w_img, h_img, col_iota)
        acc0 = jax.lax.dot_general(
            wt_ref[b, 0],
            xcol_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h0 = acc0.astype(jnp.float32) * scale_ref[b, 0] + bias_ref[b, 0]
        r0 = jnp.maximum(_poly_codes(h0, float(g)), 0)
        _build_xcol(xcol_ref, r0, w_img, h_img, col_iota)
        acc1 = jax.lax.dot_general(
            wt_ref[b, 1],
            xcol_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h1 = acc1.astype(jnp.float32) * scale_ref[b, 1] + bias_ref[b, 1]
        a1 = _poly_codes(h1, float(g))
        out_c = jnp.maximum(a1 + out_c, 0)  # residual add + relu, in codes

    out_ref[:] = out_c.astype(jnp.int16)


@functools.partial(
    jax.jit, static_argnames=("ms", "g", "w_img", "h_img", "chunk_imgs")
)
def stage_identity_blocks(
    stream: jax.Array,  # (C, B*H*W) int16 residual-code stream
    wt: jax.Array,  # (n_blocks, 2, C, 9C) int8 transposed kernels
    scale: jax.Array,  # (n_blocks, 2, C) f32
    bias: jax.Array,  # (n_blocks, 2, C) f32
    ms: Sequence[int],  # per-block requant multipliers (static)
    g: int = 127,
    w_img: int = 32,
    h_img: int = 32,
    chunk_imgs: int = 8,  # 32 exceeds the 16 MB scoped-VMEM limit on v5e
    # (the 32-bit in-kernel values quadruple the stack: 25 MB at chunk 32)
) -> jax.Array:
    """Run n consecutive identity PreAct blocks on the code stream.

    Returns the updated (C, B*H*W) int16 stream. Bit-identical to the
    act_impl='poly' XLA formulation of the same blocks (kernels/infer.py).
    """
    c, m_total = stream.shape
    img = w_img * h_img
    batch = m_total // img
    chunk_imgs = min(chunk_imgs, batch)
    assert batch % chunk_imgs == 0, (batch, chunk_imgs)
    mc = chunk_imgs * img
    n_blocks = wt.shape[0]
    assert len(ms) == n_blocks

    kernel = functools.partial(
        _stage_body, ms=tuple(ms), g=g, w_img=w_img, h_img=h_img
    )
    grid = (batch // chunk_imgs,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((c, m_total), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, mc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, mc), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((9 * c, mc), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_blocks * 2 * 9 * c * c * m_total,
            bytes_accessed=2 * 2 * c * m_total,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(stream, wt, scale.reshape(n_blocks, 2, c, 1), bias.reshape(n_blocks, 2, c, 1))


def pack_block_weights(blocks) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Stack QConvInt8 conv0/conv1 of identity blocks into the kernel's
    transposed form: HWIO (3,3,C,C) -> W^T (C_out, 9*C_in) with the 9 taps
    ordered like TAPS (row-major dy,dx) to match _build_xcol."""
    wts, scales, biases = [], [], []
    for blk in blocks:
        per_conv_w, per_conv_s, per_conv_b = [], [], []
        for name in ("conv0", "conv1"):
            q = blk[name]
            k = q.kernel_int8  # (3, 3, Cin, Cout)
            cin, cout = k.shape[2], k.shape[3]
            # (3,3,Cin,Cout) -> (Cout, 3*3*Cin) with tap-major ordering
            wt = jnp.transpose(k, (3, 0, 1, 2)).reshape(cout, 9 * cin)
            per_conv_w.append(wt)
            per_conv_s.append(q.scale)
            per_conv_b.append(q.bias)
        wts.append(jnp.stack(per_conv_w))
        scales.append(jnp.stack(per_conv_s))
        biases.append(jnp.stack(per_conv_b))
    return jnp.stack(wts), jnp.stack(scales), jnp.stack(biases)


def stage_identity_blocks_reference(stream, wt, scale, bias, ms, g, w_img, h_img):
    """Pure-jnp reference (same math, NHWC via conv_general) for tests.

    scale/bias: (n_blocks, 2, C) — broadcast over the NHWC channel axis."""
    c, m_total = stream.shape
    img = w_img * h_img
    batch = m_total // img
    # (C, B*H*W) -> (B, H, W, C)
    x = stream.reshape(c, batch, h_img, w_img).transpose(1, 2, 3, 0)
    out_c = x.astype(jnp.int32)
    n_blocks = wt.shape[0]
    for b in range(n_blocks):
        m = ms[b]
        if m == 1:
            x8 = jnp.clip(out_c, 0, g).astype(jnp.int8)
        else:
            x8 = jnp.clip((2 * out_c + m) // (2 * m), 0, g).astype(jnp.int8)
        h = out_c
        for j in range(2):
            # W^T (C_out, 9 C_in) -> HWIO
            cout = wt.shape[2]
            cin = wt.shape[3] // 9
            k = wt[b, j].reshape(cout, 3, 3, cin).transpose(1, 2, 3, 0)
            inp = x8 if j == 0 else r
            acc = jax.lax.conv_general_dilated(
                inp, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            hj = acc.astype(jnp.float32) * scale[b, j] + bias[b, j]
            codes = _poly_codes(hj, float(g))
            if j == 0:
                r = jnp.maximum(codes, 0).astype(jnp.int8)
            else:
                out_c = jnp.maximum(codes.astype(jnp.int32) + out_c, 0)
    return out_c.transpose(3, 0, 1, 2).reshape(c, m_total).astype(jnp.int16)
