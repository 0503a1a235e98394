"""True-INT8 ResNet-20 inference graph (the bench.py headline path).

Faithfully shadows the QAT ('ours') forward (resnet.py:78-98, 145-160):

    conv -> bn -> act_q -> (relu) -> ... residual add -> relu

- act_q sites run at PRODUCTION (right after the folded conv+bn), exactly
  like training: codes = round(clip(erf(h/sqrt2), -1, 1) * 127) — the value
  is ACT_SCALE*codes, the canonical-int8 form of the reference's
  fake-quant grid (SURVEY.md section 2.4.6).
- relu / residual adds run on INTEGER CODES (int16, act_scale units; max
  |K| = 4*g = 508 — int16 halves the residual stream's HBM traffic, the
  graph's largest tensors) — all
  inter-site values are exact multiples of ACT_SCALE by construction, and a
  float-valued stream is fusion-nondeterministic at the requant ties (see
  _requant_codes). Value semantics are identical to training's f32 adds.
- conv INPUTS are int8:
  * conv1 consumes relu(act-quantized codes) — bit-exact re-use of the
    codes, no requantization error;
  * block conv0 / skip consume residual code sums — one exact-integer
    requantization at the per-block bound (residual_multipliers(); identity
    shortcuts grow the sum by +act_range per block, so the bound is 4/6/8
    within each stage). The requant error (<= scale/2) is absent in plain
    fake-quant training; the deploy-exact QAT mode (models/resnet_cifar.py
    PreActResNet.deploy_exact) trains with these exact sites — same integer
    rounding, quant/ste.py requant_grid_ste — closing the train!=deploy gap;
  * the stem consumes normalized images at a static calibration scale
    S_IMG.
- BN folds into the conv epilogue per-channel scale/bias (convert.py).

An earlier formulation quantized with erf at conv CONSUMPTION instead of
production; it agreed at random init but collapsed on trained nets (erf of
a residual sum != sum of erf's) — tools/export_int8.py measures the
deployment delta and guards against that class of bug.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from alignq_tpu.kernels.convert import QConvInt8, fold_conv_bn

_SQRT2 = math.sqrt(2.0)

# 8-bit defaults; the general W{b}A{b} grids come from convert.grid_max
ACT_SCALE = 2.0 / 127.0  # act_range=2 over the symmetric 127 grid
S_RES = 4.0 / 127.0  # legacy fixed residual scale (kept for API compat; the
# graph now uses the exact per-block bounds from residual_bounds() — a fixed
# [0,4] range CLIPS: identity shortcuts grow the residual sum by +act_range
# per block within a stage, so stage-final sums reach 8 (measured 7.86)
S_IMG = 3.0 / 127.0  # normalized-image scale (CIFAR norm ~ [-2.5, 2.7])
ACT_RANGE = 2.0


def residual_multipliers(has_skip):
    """Exact per-block input bounds as INTEGER multiples of act_range.

    Block k's conv0/skip consume block k-1's output `out = relu(a1 + sc)`
    with a1 in [-act_range, act_range]. The shortcut is act-quantized on
    stride blocks (|sc| <= act_range) but is the raw previous output on
    identity blocks, so the bound grows by +act_range per identity block and
    resets at each stride block:

        stem -> 1; identity blk -> in + 1; stride blk -> 2   (x act_range)

    For ResNet-20 (3 blocks/stage) that is m = [1,2,3, 4,2,3, 4,2,3] —
    tight against measured maxima (3.95..7.86 at act_range=2). The
    integrality of m is what lets the requantization run in exact integer
    arithmetic (_requant_codes): the block-input grid is m * act_scale.
    """
    ms, m = [], 1  # stem relu output
    for skip in has_skip:
        ms.append(m)
        m = 1 + (1 if skip else m)
    return ms


def residual_bounds(has_skip, act_range: float = ACT_RANGE):
    """Per-block input-value bounds (residual_multipliers * act_range)."""
    return [m * act_range for m in residual_multipliers(has_skip)]


def _act_g(act_bits: int) -> float:
    from alignq_tpu.kernels.convert import grid_max

    return float(grid_max(act_bits))


def _erfq_codes(h: jax.Array, act_bits: int = 8, impl: str = "erf") -> jax.Array:
    """Act-site quantization codes: round(c(h) * g) in int8 storage
    (g = 127 for A8, 7 for A4).

    impl='erf':  c = erf(h/sqrt2), the reference-exact CDF (default).
    impl='poly': c = ERF_SQRT2_POLY(h) (quant/cdf.py) — the TPU fast path
      (~11 VPU ops vs ~25-30 for XLA's f32 erf; the erf epilogues are the
      INT8 graph's single largest cost, tools/int8_breakdown.py). MUST pair
      with a QAT run using QuantAct(cdf_impl='poly') — the poly is a
      self-consistent alternative quantizer grid, and mixing grids between
      train and deploy flips ~0.005% of codes.
    impl='bins' (act_bits <= 4 only): codes by direct comparison against
      the g exact erf-grid boundaries (quant/cdf.py erf_grid_boundaries) —
      g compare+add pairs, no transcendental. Unlike 'poly' this IS the erf
      grid (boundaries exact for true erf, f64->f32), so it pairs with a
      standard erf-grid QAT run — no retraining. Differs from the erf path
      only for h within ~1 ulp of a boundary (XLA's erf is itself a few-ulp
      approximation; jnp.round is half-to-even while bins is half-up).

    Elementwise — XLA fuses it into the preceding conv's epilogue."""
    g = _act_g(act_bits)
    if impl == "bins":
        from alignq_tpu.quant.cdf import erf_grid_boundaries

        assert g <= 15, "bins impl is for the A4/A2 grids (A8 g=127: use poly)"
        acc = jnp.zeros(h.shape, jnp.int8)
        for tk in erf_grid_boundaries(int(g)):
            acc = acc + (h >= tk).astype(jnp.int8) - (h <= -tk).astype(jnp.int8)
        return acc
    if impl == "erf":
        c = jax.lax.erf(h / _SQRT2)
    else:
        from alignq_tpu.quant.cdf import erf_sqrt2

        c = erf_sqrt2(h, impl)
    return jnp.clip(jnp.round(c * g), -g, g).astype(jnp.int8)


def _linear_q(x: jax.Array, scale: float) -> jax.Array:
    # stem-input quantization of real image data (ties measure-zero there).
    # Reciprocal multiply, not division: bit-matches the deploy-exact QAT
    # stem requant (quant/ste.py requant_ste) so train and deploy round the
    # same codes
    return jnp.clip(jnp.round(x * (1.0 / scale)), -127.0, 127.0).astype(jnp.int8)


def _requant_codes(k: jax.Array, m: int, g: float, signed: bool = False) -> jax.Array:
    """Residual-stream requantization in EXACT integer arithmetic.

    The residual stream is carried as integer codes K >= 0 in act_scale
    units (int16 storage — |K| <= 508);
    the block-input grid is m*act_scale (m = residual_multipliers entry), so
    the target code is round(K/m) — which lands exactly on .5 ties for even
    m (every odd K). Rounding those ties in float is fusion-nondeterministic
    (the fp error of K*act_scale/in_scale decides the side — measured ~26%
    code flips between XLA fusion choices of the same graph). Round-half-up
    integer arithmetic (2K + m) // (2m) is bit-deterministic under any
    fusion and matches the deploy-exact QAT requant (quant/ste.py
    requant_grid_ste) code-for-code.

    signed=True admits negative K (e.g. MobileNet block outputs, which have
    no trailing relu): integer floor-division rounds half-up toward +inf for
    negative operands too, so the tie side stays deterministic.

    m MUST be a static Python int: XLA strength-reduces division by a
    compile-time constant to multiply-shift, but division by a traced scalar
    lowers to per-element software division — measured 25x on the whole
    graph. Callers derive m from the static block structure
    (residual_multipliers), never from a jitted-arg pytree leaf."""
    assert isinstance(m, int), "m must be static (see docstring)"
    gi = int(g)
    lo = -gi if signed else 0
    k = k.astype(jnp.int32)  # headroom for 2K+m (inputs are int16 storage)
    if m == 1:  # lossless pass-through (e.g. block 0): round(K/1) == K
        return jnp.clip(k, lo, gi).astype(jnp.int8)
    return jnp.clip((2 * k + m) // (2 * m), lo, gi).astype(jnp.int8)


def _int8_conv_1x1_pallas(x_int8: jax.Array, q: QConvInt8, stride: int = 1):
    """1x1 conv as the fused Pallas int8 matmul (kernels/qmatmul.py).

    A 1x1 stride-s conv is a strided spatial subsample followed by a
    (B*H'*W', Cin) @ (Cin, Cout) matmul; the Pallas kernel fuses the
    int32->f32 dequant + bias epilogue in VMEM. Used when
    resnet20_int8_forward(use_pallas_1x1=True); the head-to-head numbers
    are in ARCHITECTURE.md (Pallas vs XLA per site).
    """
    from alignq_tpu.kernels.qmatmul import int8_matmul_dequant

    if stride != 1:
        x_int8 = x_int8[:, ::stride, ::stride, :]
    b, h, w, cin = x_int8.shape
    kmat = q.kernel_int8.reshape(cin, -1)  # HWIO 1x1 -> (Cin, Cout)
    y = int8_matmul_dequant(
        x_int8.reshape(-1, cin), kmat, q.scale, q.bias
    )
    return y.reshape(b, h, w, -1)


def _int8_conv_merged_skip(x_int8: jax.Array, q0: QConvInt8, qs: QConvInt8, stride: int):
    """Stage-boundary conv0 (3x3, pad 1) and skip (1x1, pad 0) fused into ONE
    conv over concatenated output channels.

    Both consume the same requantized x8 at the same stride; a 1x1 pad-0
    conv equals a 3x3 pad-1 conv whose kernel is zero except the center tap
    (output (i,j) reads x[si, sj] either way). Concatenating the padded skip
    kernel onto conv0's output channels therefore computes BIT-IDENTICAL
    int32 accumulators in one MXU pass: Cout doubles (32->64 / 64->128 of
    the 128 MXU lanes, vs <=50% for each half alone), x8 is read from HBM
    once instead of twice, and one kernel launch disappears. The per-channel
    scale/bias epilogues concatenate alongside, so the dequantized halves
    match `_int8_conv(x8, q0/qs)` exactly (test_kernels bitwise test).
    """
    ks3 = jnp.pad(qs.kernel_int8, ((1, 1), (1, 1), (0, 0), (0, 0)))
    km = jnp.concatenate([q0.kernel_int8, ks3], axis=3)
    acc = jax.lax.conv_general_dilated(
        x_int8,
        km,
        window_strides=(stride, stride),
        padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = jnp.concatenate([q0.scale, qs.scale])
    bias = jnp.concatenate([q0.bias, qs.bias])
    h = acc.astype(jnp.float32) * scale + bias
    c0 = q0.kernel_int8.shape[3]
    return h[..., :c0], h[..., c0:]


def _int8_conv_acc(x_int8: jax.Array, q: QConvInt8, stride: int = 1, padding: int = 1):
    """Raw int32 MXU accumulator of one folded conv (no dequant epilogue)."""
    return jax.lax.conv_general_dilated(
        x_int8,
        q.kernel_int8,
        window_strides=(stride, stride),
        padding=[(padding, padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _int8_conv(x_int8: jax.Array, q: QConvInt8, stride: int = 1, padding: int = 1):
    acc = _int8_conv_acc(x_int8, q, stride, padding)
    return acc.astype(jnp.float32) * q.scale + q.bias


def act_int_cutpoints(q: QConvInt8, act_bits: int):
    """Per-channel INT32 decision cutpoints of the A4/A2 erf act grid,
    folded through this conv's dequant+BN epilogue (host-side, float64).

    The act site evaluates codes = round(erf(h/sqrt2) * g) on the conv
    epilogue h = scale_c * A + bias_c (A = int32 MXU accumulator). With the
    grid's exact real boundaries t_k (quant/cdf.py erf_grid_boundaries) and
    s = |scale_c|, sgn = sign(scale_c), integer A gives

        code(A) >= k   iff  sgn*A >= ceil(( t_k - bias_c) / s)
        code(A) <= -k  iff  sgn*A <= floor((-t_k - bias_c) / s)

    so the whole dequant+bn+erf+round epilogue collapses to g integer
    compare+add pairs on the accumulator — no f32 affine, no
    transcendental, and no rounding-boundary tie hazard at all (the
    VERDICT-r4 'integer-domain requant' candidate; the f32 'bins' path can
    flip a code when the f32 evaluation of h lands within ~1 ulp of a
    boundary — here the boundary IS an exact integer). float64 is exact for
    this fold: |cutpoint| is clamped into int32 and f64 holds integers to
    2^53. Degenerate scale_c == 0 channels (h constant at bias_c) emit
    their constant code via always/never sentinel cutpoints. Call OUTSIDE
    jit (host numpy); practical for the A4/A2 grids like 'bins'."""
    import numpy as np

    from alignq_tpu.quant.cdf import erf_grid_boundaries

    g = int(_act_g(act_bits))
    assert g <= 15, "bins_int is for the A4/A2 grids (A8 g=127: use poly)"
    s = np.asarray(q.scale, np.float64)
    b = np.asarray(q.bias, np.float64)
    sgn = np.where(s >= 0, 1, -1).astype(np.int32)
    mag = np.abs(s)
    big = np.int64(2**31 - 2)  # sentinel: beyond any reachable accumulator
    t1 = np.empty((g, s.size), np.int64)
    t2 = np.empty((g, s.size), np.int64)
    # the SAME f32-rounded boundaries the 'bins' impl compares against
    # (exact as f64), so both impls realize one grid
    boundaries = [float(tk) for tk in erf_grid_boundaries(g)]
    nz = mag > 0
    safe = np.where(nz, mag, 1.0)
    for k, tk in enumerate(boundaries):
        t1[k] = np.where(
            nz,
            np.clip(np.ceil((tk - b) / safe), -big, big),
            np.where(b >= tk, -big, big),  # constant h: always/never >= t_k
        ).astype(np.int64)
        t2[k] = np.where(
            nz,
            np.clip(np.floor((-tk - b) / safe), -big, big),
            np.where(b <= -tk, big, -big),  # always/never <= -t_k
        ).astype(np.int64)
    return {
        "sgn": jnp.asarray(sgn),
        "t1": jnp.asarray(t1.astype(np.int32)),
        "t2": jnp.asarray(t2.astype(np.int32)),
    }


def _int_bin_codes(acc: jax.Array, cut) -> jax.Array:
    """Act codes from the raw int32 accumulator by integer compare chains
    against per-channel cutpoints (see act_int_cutpoints). Elementwise —
    XLA fuses it into the conv like the other act impls."""
    a = acc * cut["sgn"]  # fold negative BN scales into the comparand
    codes = jnp.zeros(acc.shape, jnp.int8)
    for k in range(cut["t1"].shape[0]):
        codes = (
            codes
            + (a >= cut["t1"][k]).astype(jnp.int8)
            - (a <= cut["t2"][k]).astype(jnp.int8)
        )
    return codes


def augment_int_cutpoints(qparams: Dict[str, Any], act_bits: int) -> Dict[str, Any]:
    """Host-side pass adding integer act cutpoints ('*_cut' entries) to a
    convert_preact_resnet qparams tree, enabling
    resnet20_int8_forward(act_impl='bins_int'). A4/A2 only."""
    out = dict(qparams)
    out["conv0_cut"] = act_int_cutpoints(qparams["conv0"], act_bits)
    layers = []
    for blk in qparams["layers"]:
        nb = dict(blk)
        nb["cut0"] = act_int_cutpoints(blk["conv0"], act_bits)
        nb["cut1"] = act_int_cutpoints(blk["conv1"], act_bits)
        if "skip" in blk:
            nb["cut_skip"] = act_int_cutpoints(blk["skip"], act_bits)
        layers.append(nb)
    out["layers"] = layers
    return out


def convert_preact_resnet(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    weight_bits: int = 8,
    act_bits: int = 8,
) -> Dict[str, Any]:
    """Fold every conv+bn pair of a trained PreActResNet (20 OR 56 — the
    converter walks `layers_*` structurally) into integer form
    (W{weight_bits}A{act_bits}; codes stored int8).

    Each conv's epilogue scale folds ITS OWN input scale: stem S_IMG, block
    conv0/skip the exact per-block residual bound, conv1 the act grid
    scale."""
    out: Dict[str, Any] = {}
    g = _act_g(act_bits)

    def fold(conv_path, bn_path, act_scale):
        k = params
        for p in conv_path:
            k = k[p]
        bnp, bns = params, batch_stats
        for p in bn_path:
            bnp = bnp[p]
            bns = bns[p]
        return fold_conv_bn(
            k["kernel"], bnp["scale"], bnp["bias"], bns["mean"], bns["var"],
            act_scale=act_scale, bits=weight_bits,
        )

    out["conv0"] = fold(("conv0",), ("bn",), S_IMG)
    layers = sorted(
        (k for k in params if k.startswith("layers_")),
        key=lambda s: int(s.split("_")[1]),
    )
    # conv0/skip consume the previous block's residual output; use the exact
    # per-block bound (residual_multipliers * act_range) so no
    # requantization clips. Block 0 consumes the stem at m=1 (lossless).
    ms = residual_multipliers(["skip_conv" in params[n] for n in layers])
    out["layers"] = []
    for name, m in zip(layers, ms):
        in_scale = m * ACT_RANGE / g
        blk = {
            "conv0": fold((name, "conv0"), (name, "bn0"), in_scale),
            "conv1": fold((name, "conv1"), (name, "bn1"), ACT_RANGE / g),
            "in_scale": in_scale,
            # informational: the forward derives m from the static block
            # structure instead (a pytree leaf would be traced under jit)
            "m": m,
        }
        if "skip_conv" in params[name]:
            blk["skip"] = fold((name, "skip_conv"), (name, "skip_bn"), in_scale)
        out["layers"].append(blk)
    out["logit"] = {
        "kernel": params["logit"]["kernel"],
        "bias": params["logit"]["bias"],
    }
    return out


def _stage_kernel_chunk_imgs(c: int, h: int, w: int, batch: int) -> int:
    """Largest image chunk whose (9C, Mc) im2col scratch stays ~4.7 MB
    (Mc = 2^19 / C), shrunk to a divisor of batch."""
    chunk = max(1, min(batch, (2 ** 19 // c) // (h * w)))
    while batch % chunk:
        chunk -= 1
    return chunk


def resnet20_int8_forward(
    qparams: Dict[str, Any], x: jax.Array, act_bits: int = 8,
    use_pallas_1x1: bool = False, fuse_skip: bool = False,
    act_impl: str = "erf", use_stage_kernel: bool = False,
    stream: str = "int16",
) -> jax.Array:
    """INT forward shadowing the 'ours' QAT graph value-for-value.

    act_bits is static; pass the same value used in convert_resnet20.
    use_pallas_1x1 routes the 1x1 skip convs through the fused Pallas int8
    matmul instead of XLA's conv (head-to-head in ARCHITECTURE.md).
    fuse_skip merges each stage-boundary skip conv into its conv0 as one
    double-width MXU pass (_int8_conv_merged_skip — bit-identical logits;
    ignored under use_pallas_1x1, which routes the skip elsewhere).
    MEASURED AND REJECTED as the default: same-process honest A/B at batch
    1024 ran it 1.36x SLOWER e2e (3.38 vs 2.48 ms — tools/ab_int8_variants.py)
    despite a 1.26x CPU win; XLA's layout/fusion choices for the two separate
    convs beat the hand-merged double-width conv. Kept as a tested,
    bit-identical option.
    act_impl selects the act-site CDF evaluation ('erf' reference-exact,
    'poly' TPU fast grid — see _erfq_codes; pair with the same cdf_impl in
    QAT). 'bins'/'bins_int' (A4/A2 only) realize the exact erf grid by
    boundary comparison — 'bins' on the f32 epilogue, 'bins_int' directly
    on the int32 accumulator via per-channel integer cutpoints
    (act_int_cutpoints folds dequant+bn+erf-boundaries; requires
    augment_int_cutpoints(qparams, act_bits) outside jit; no f32 act
    epilogue and no boundary-tie hazard).
    stream='int8' stores the inter-block residual stream as the
    requantized block-input codes themselves (int8, half the HBM bytes of
    the exact int16 stream): the requant moves from the next block's input
    to this block's output and the identity shortcut reads the REQUANTIZED
    codes instead of the full-resolution sum — each edge loses log2(m) <= 2
    bits of stream resolution. MUST pair with a QAT run using
    PreActResNet(deploy_exact=True, stream_int8=True), which trains these
    exact edge semantics (requant_grid_ste on the full stream). All
    arithmetic stays exact-integer and bit-deterministic.
    use_stage_kernel routes each run of consecutive identity blocks through
    the VMEM-resident Pallas megakernel (kernels/stage_kernel.py; requires
    act_impl='poly' — Mosaic has no bit-exact erf). Integer-exact vs the
    XLA poly formulation; f32-epilogue FMA-contraction differences can flip
    ~1e-5 of codes at rounding ties (stage_kernel.py docstring).
    Stage-boundary stride-2 blocks stay XLA.

    The residual stream is carried as INT32 CODES in act_scale units (every
    inter-site value is an exact multiple of act_scale by construction), so
    the residual adds, relus, and block-input requantizations are exact
    integer arithmetic — the graph's predictions are bit-deterministic under
    any XLA fusion/recompilation. A float-valued stream is NOT: its requant
    ratios K/m land exactly on .5 ties, where fp fusion order decides the
    rounding side (measured ~26% code flips jit-vs-stepwise on TPU; see
    _requant_codes). f32 appears only inside each conv's dequant epilogue,
    where values are generic reals and ties have measure zero."""
    g = _act_g(act_bits)
    act_scale = ACT_RANGE / g
    bins_int = act_impl == "bins_int"
    if bins_int:
        # integer-domain act sites: codes straight off the int32
        # accumulator via per-channel cutpoints (act_int_cutpoints) — no
        # f32 dequant affine at act sites at all
        assert "conv0_cut" in qparams, (
            "act_impl='bins_int' needs augment_int_cutpoints(qparams, "
            "act_bits) applied outside jit"
        )
        assert not (use_pallas_1x1 or fuse_skip or use_stage_kernel), (
            "bins_int pairs with the default XLA conv path"
        )

    def _site_codes(x8_in, q, cut, stride_, pad_):
        """One act site: conv -> codes, f32-epilogue or integer-cutpoint."""
        if bins_int:
            return _int_bin_codes(_int8_conv_acc(x8_in, q, stride_, pad_), cut)
        return _erfq_codes(_int8_conv(x8_in, q, stride_, pad_), act_bits, act_impl)

    # per-block bound multipliers from the STATIC block structure (NOT from
    # the qparams leaf "m": a pytree leaf is traced under jit, and integer
    # division by a traced scalar is per-element software division — 25x)
    ms = residual_multipliers(["skip" in blk for blk in qparams["layers"]])
    # stem: conv0 -> bn -> act_q0 -> relu (resnet.py:147-151)
    out_c = jnp.maximum(
        _site_codes(
            _linear_q(x, S_IMG), qparams["conv0"],
            qparams.get("conv0_cut"), 1, 1,
        ).astype(jnp.int16),
        0,
    )

    assert stream in ("int16", "int8"), stream
    if stream == "int8":
        assert not use_stage_kernel, "stage kernel carries the int16 stream"
        # c8: int8 codes on the CURRENT block's m*act_scale grid — the conv
        # input itself IS the stored stream (stem codes are grid m=1)
        c8 = out_c.astype(jnp.int8)

    if use_stage_kernel:
        assert act_impl == "poly", "stage kernel pairs with the poly act grid"
        from alignq_tpu.kernels.stage_kernel import (
            pack_block_weights,
            stage_identity_blocks,
        )

    layers = qparams["layers"]
    i = 0
    while i < len(layers):
        blk = layers[i]
        if use_stage_kernel and "skip" not in blk:
            # run of consecutive identity blocks -> one VMEM-resident call
            j = i
            while j < len(layers) and "skip" not in layers[j]:
                j += 1
            bsz, hh, ww, c = out_c.shape
            wt, scale, bias = pack_block_weights(layers[i:j])
            # NOTE: do not name this `stream` — that would shadow the string
            # argument consulted by the `stream == "int8"` branches below
            flat_c = out_c.transpose(3, 0, 1, 2).reshape(c, -1)
            flat_c = stage_identity_blocks(
                flat_c, wt, scale, bias, tuple(ms[i:j]), g=int(g),
                w_img=ww, h_img=hh,
                chunk_imgs=_stage_kernel_chunk_imgs(c, hh, ww, bsz),
            )
            out_c = flat_c.reshape(c, bsz, hh, ww).transpose(1, 2, 3, 0)
            i = j
            continue
        m = ms[i]
        stride = 2 if "skip" in blk else 1
        if stream == "int8":
            x8 = c8  # already on the m*act_scale grid (stored that way)
        else:
            # block 0 (m=1): codes pass through losslessly; later blocks: one
            # exact-bound integer requantization of the residual code sum
            x8 = _requant_codes(out_c, m, g)
        if "skip" in blk:
            # shortcut = act_skip_q(skip_bn(skip_conv(x))) — no relu
            if use_pallas_1x1:
                sc_h = _int8_conv_1x1_pallas(x8, blk["skip"], stride)
                sc_c = _erfq_codes(sc_h, act_bits, act_impl).astype(jnp.int16)
                h0 = _int8_conv(x8, blk["conv0"], stride, 1)
                a0 = _erfq_codes(h0, act_bits, act_impl)
            elif fuse_skip:
                h0, sc_h = _int8_conv_merged_skip(x8, blk["conv0"], blk["skip"], stride)
                sc_c = _erfq_codes(sc_h, act_bits, act_impl).astype(jnp.int16)
                a0 = _erfq_codes(h0, act_bits, act_impl)
            else:
                sc_c = _site_codes(
                    x8, blk["skip"], blk.get("cut_skip"), stride, 0
                ).astype(jnp.int16)
                a0 = _site_codes(x8, blk["conv0"], blk.get("cut0"), stride, 1)
        else:
            # int16 stream: full-resolution code sum; int8 stream: the
            # requantized codes scaled back to grid-1 units (m * c8)
            sc_c = (
                m * c8.astype(jnp.int16) if stream == "int8" else out_c
            )
            a0 = _site_codes(x8, blk["conv0"], blk.get("cut0"), stride, 1)
        r0 = jnp.maximum(a0, 0)  # relu on codes == relu on values (sign-preserving grid)
        a1_c = _site_codes(
            r0.astype(jnp.int8), blk["conv1"], blk.get("cut1"), 1, 1
        ).astype(jnp.int16)  # act_q1
        out_c = jnp.maximum(a1_c + sc_c, 0)  # residual add + relu, in codes
        if stream == "int8" and i + 1 < len(layers):
            # requant the WHOLE stream (shortcut included) onto the next
            # block's grid — the stored tensor is int8
            c8 = _requant_codes(out_c, ms[i + 1], g)
        i += 1

    # mean over 64 spatial positions is exact in f32 (int sum < 2^24, /64 is
    # a power of two); one act_scale multiply rescales codes -> values
    feat = jnp.mean(out_c.astype(jnp.float32), axis=(1, 2)) * act_scale
    return feat @ qparams["logit"]["kernel"] + qparams["logit"]["bias"]


# back-compat alias; works for any PreActResNet depth
convert_resnet20 = convert_preact_resnet


def build_resnet20_int8(batch: int):
    """(fn, args) pair for bench.py: jitted int8 forward on fresh params."""
    from alignq_tpu.models import resnet20_quant

    model = resnet20_quant(bitW=8, abitW=8, method="ours")
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x, train=False)
    qparams = convert_resnet20(variables["params"], variables["batch_stats"])
    fwd = jax.jit(resnet20_int8_forward)
    return fwd, (qparams, x)
