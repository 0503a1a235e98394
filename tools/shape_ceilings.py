"""Per-shape achievable-TOPS ceilings for every deployed INT8 graph
(VERDICT.md round-2 item 2: one protocol, one table, reconcile 63-vs-144).

RECONCILIATION of the round-2 contradiction (ARCHITECTURE.md:138 vs :199).
Both old numbers timed the same stage-1 conv under the chained value-fetch
protocol but with different COUPLING between chain links:
- bench.py measure_conv_sol coupled links through a SCALAR read of the full
  previous output (`x + (acc[0,0,0,0] & 1)`), a complete barrier per conv —
  that measures LATENCY (compute + un-overlapped epilogue/DMA): ~77 us,
  63 TOPS.
- tools/int8_breakdown.py selfchain coupled links ELEMENTWISE
  (`(acc & 63).astype(int8)`), which XLA fuses into the conv epilogue and
  pipelines tile-by-tile — that measures THROUGHPUT: ~34 us, 144 TOPS.
Neither was wrong; they measure different quantities. A model ceiling is a
THROUGHPUT question (convs in a real graph overlap exactly this way —
that is why the scalar-coupled sum overstated the e2e conv time 1.9x), so:

PINNED PROTOCOL (the one this repo now uses for every per-shape ceiling):
chained value-fetch (tools/honest_timing.py) with ELEMENTWISE-coupled
links. Same-shape convs (cin==cout, stride 1, incl. depthwise) self-chain
(`(acc & 63) -> int8`); shape-changing convs couple through a scalar and
get the separately measured null-coupling cost subtracted (documented
latency bias, small: shape-changers carry a minority of model FLOPs).

Per model: ceiling_ms = sum(count * t_shape) over the distinct conv shapes
of its DEPLOYED int8 graph — extracted automatically from the traced jaxpr
(so DenseNet's preallocated full-width convs and MobileNet's depthwise
shapes are exactly what ships. NOTE the act-quant epilogues, residual
stream, and head are real mandatory work NOT in the ceiling: the ceiling is
conv speed-of-light, so frac_of_achievable = ceiling/e2e < 1 even for a
perfect implementation). With --e2e the tool also measures each family's
full graph IN THE SAME PROCESS and prints frac_of_achievable = ceiling/e2e.

    timeout 5400 python tools/shape_ceilings.py --families resnet20,resnet56,resnet50 --e2e
    env ... JSON lines -> also written to /tmp/shape_ceilings.json
"""

from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from tools.honest_timing import measure  # noqa: E402


def conv_inventory(fn, *args) -> dict:
    """{key: count} over the traced graph, recursing into nested jaxprs
    (pjit/cond/scan bodies).

    The key captures EVERYTHING the XLA conv emitter sees: lhs/rhs/out
    shapes, strides, padding, lhs/rhs dilation, feature groups, dimension
    numbers, operand/output dtypes, and precision — so QAT graphs (f32
    HIGHEST or bf16 MXU forward convs PLUS the two transposed VJP convs per
    site, which appear as conv_general_dilated with dilations and permuted
    dimension numbers) inventory exactly as they compile, alongside the
    int8 inference graphs (round-3 key format extended for VERDICT r3
    item 7)."""
    shapes: dict = {}

    def walk(jaxpr):
        for eqn in jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs_av, rhs_av = eqn.invars[0].aval, eqn.invars[1].aval
                out_av = eqn.outvars[0].aval
                p = eqn.params
                dn = p["dimension_numbers"]
                key = (
                    tuple(lhs_av.shape), tuple(rhs_av.shape),
                    tuple(out_av.shape),
                    tuple(p["window_strides"]),
                    tuple(map(tuple, p["padding"])),
                    tuple(p.get("lhs_dilation") or ()),
                    tuple(p.get("rhs_dilation") or ()),
                    int(p["feature_group_count"]),
                    (tuple(dn.lhs_spec), tuple(dn.rhs_spec), tuple(dn.out_spec)),
                    str(lhs_av.dtype), str(out_av.dtype),
                    str(p.get("precision")),
                )
                shapes[key] = shapes.get(key, 0) + 1
            for v in eqn.params.values():
                for sub in _sub_jaxprs(v):
                    walk(sub)

    def _sub_jaxprs(v):
        out = []
        vals = v if isinstance(v, (list, tuple)) else [v]
        for item in vals:
            j = getattr(item, "jaxpr", None)
            if j is not None:
                out.append(j)
    # closed jaxprs wrap .jaxpr again
        return [getattr(j, "jaxpr", j) for j in out]

    walk(jax.make_jaxpr(fn)(*args).jaxpr)
    return shapes


def shape_flops(key) -> float:
    """2 * prod(out_shape) * (kh*kw*cin_g) — dimension-number-agnostic:
    prod(rhs_shape)/cout = kh*kw*cin_g, with cout read off the rhs spec."""
    rhs, out = key[1], key[2]
    rhs_spec = key[8][1]
    cout = rhs[rhs_spec[0]]
    return float(2.0 * np.prod(out) * np.prod(rhs) / max(cout, 1))


_NULL_MS_CACHE: dict = {}


def _null_coupling_s(x0) -> float:
    """Cost (seconds) of the scalar coupling traversal alone, to subtract."""
    key = (x0.shape, str(x0.dtype))
    if key not in _NULL_MS_CACHE:
        if jnp.issubdtype(x0.dtype, jnp.integer):
            def null_step(x):
                s = (jnp.sum(x.astype(jnp.int32)) & 1).astype(x.dtype)
                return x ^ s
        else:
            def null_step(x):
                s = (jnp.sum(x.astype(jnp.float32)) * 1e-20).astype(x.dtype)
                return x + s

        _NULL_MS_CACHE[key] = measure(
            f"null:{key}", null_step, x0, n1=16, n2=128, quiet=True
        )
    return _NULL_MS_CACHE[key]


def _parse_precision(s: str):
    import jax.lax as lax

    if s == "None":
        return None
    table = {
        "Precision.HIGHEST": lax.Precision.HIGHEST,
        "Precision.HIGH": lax.Precision.HIGH,
        "Precision.DEFAULT": lax.Precision.DEFAULT,
        "HIGHEST": lax.Precision.HIGHEST,
        "HIGH": lax.Precision.HIGH,
        "DEFAULT": lax.Precision.DEFAULT,
    }
    for name, val in table.items():
        if name in s:
            return val
    return None


def measure_shape(key, n1=8, n2=40) -> float:
    """Achievable seconds/conv for one inventory key (pinned protocol:
    elementwise-coupled chain for shape-preserving convs, scalar coupling
    minus the null-coupling cost otherwise — module docstring).

    Chain lengths adapt to the shape: a differenced signal under ~40 ms is
    inside this backend's RPC jitter (a ~20 us 1x1 conv differenced over 32
    links measured NEGATIVE), so small shapes re-measure with chains scaled
    to put >= ~60 ms between the two program sizes."""
    (lhs_s, rhs_s, out_s, strides, pad, ldil, rdil, fgc, dn_spec,
     lhs_dt, out_dt, prec_s) = key
    import jax.lax as lax

    dtype = jnp.dtype(lhs_dt)
    out_dtype = jnp.dtype(out_dt)
    rng = np.random.RandomState(0)
    if jnp.issubdtype(dtype, jnp.integer):
        w = jnp.asarray(rng.randint(-16, 16, rhs_s), dtype)
        x0 = jnp.asarray(rng.randint(-64, 64, lhs_s), dtype)
    else:
        w = jnp.asarray(rng.randn(*rhs_s) * 0.1, dtype)
        x0 = jnp.asarray(rng.randn(*lhs_s) * 0.1, dtype)

    dn = jax.lax.ConvDimensionNumbers(*dn_spec)
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        rhs=w, window_strides=strides, padding=list(pad),
        lhs_dilation=ldil or None, rhs_dilation=rdil or None,
        dimension_numbers=dn, feature_group_count=fgc,
        preferred_element_type=out_dtype,
        precision=_parse_precision(prec_s),
    )
    same_shape = tuple(out_s) == tuple(lhs_s)

    if same_shape:
        if jnp.issubdtype(dtype, jnp.integer):
            def step(x):
                return (conv(lhs=x) & 63).astype(dtype)
        else:
            def step(x):
                # bounded elementwise re-normalization: fuses into the conv
                # epilogue exactly like an act-quant pass would
                return jnp.clip(conv(lhs=x) * 0.01, -1.0, 1.0).astype(dtype)

        def run(a, b2):
            return measure(None, step, x0, n1=a, n2=b2, quiet=True)
    else:
        if jnp.issubdtype(dtype, jnp.integer):
            def step(x):
                acc = conv(lhs=x)
                s = (jnp.sum(acc) & 1).astype(dtype)
                return x ^ s
        else:
            def step(x):
                acc = conv(lhs=x)
                s = (jnp.sum(acc.astype(jnp.float32)) * 1e-20).astype(dtype)
                return x + s

        def run(a, b2):
            dt = measure(None, step, x0, n1=a, n2=b2, quiet=True)
            # floor: for tiny convs the coupling traversal rivals the conv
            return max(dt - _null_coupling_s(x0), 0.2 * dt)

    dt = run(n1, n2)
    if n2 - n1 >= 8:  # adaptive retry only in real (non-smoke) runs
        signal = dt * (n2 - n1)
        if signal < 0.04:  # < 40 ms between the two programs: jitter regime
            # cap the scale: chains are UNROLLED inside one jit program, and
            # a many-hundred-op program takes minutes to compile remotely
            # (the cap trades some jitter on the tiniest shapes — which carry
            # negligible ceiling mass — for bounded compile time)
            scale = min(6, max(2, int(np.ceil(0.06 / max(signal, 1e-3)))))
            dt = run(n1 * scale, n2 * scale)
    return max(dt, 1e-9)


# ---- graph-level ceilings: conv + MANDATORY epilogues (VERDICT r4 item 3) --
#
# The conv-only ceiling is the wrong denominator for proving optimality:
# the act-quant sites, the residual code stream, and the head are MANDATORY
# work of the deployed semantics, so a perfect implementation still reads
# frac_of_achievable < 1. The graph ceiling prices them too, each with the
# same pinned elementwise-coupled chain protocol, from a topology-derived
# inventory (kernels/infer.py residual_multipliers / the forward's site
# structure). Honest-direction choices: the chain-coupling overhead is
# SUBTRACTED from every epilogue row (undercounting the epilogue shrinks
# the ceiling and lowers the reported fraction — conservative), and the
# head is measured, not estimated. Per-row noise is the protocol's usual
# +-10-15%; the fraction inherits it.


def preact_epilogue_inventory(depth: int, batch: int):
    """Act-site and stream-op inventories of the deployed PreActResNet INT
    graph (kernels/infer.py resnet20_int8_forward), keyed by tensor shape.

    Per stage of n=(depth-2)//6 blocks: the stem act (stage 1), 2 act
    sites per block (a0, a1), one extra per stage-boundary skip; one
    residual add+relu per block at its output shape; one stream requant
    per block at its INPUT shape (stage-boundary blocks requantize the
    previous stage's larger map)."""
    n = (depth - 2) // 6
    s1, s2, s3 = ((batch, 32, 32, 16), (batch, 16, 16, 32),
                  (batch, 8, 8, 64))
    act = {s1: 1 + 2 * n, s2: 2 * n + 1, s3: 2 * n + 1}
    add = {s1: n, s2: n, s3: n}
    requant = {s1: n + 1, s2: n, s3: n - 1}
    return act, add, requant


# Per-shape epilogue times, memoized across families within a process
# (mirrors main()'s shape_times cache for convs): ResNet-20 and -56 share
# the same act/stream shapes and differ only in counts, so re-measuring
# for the second family buys nothing and — observed on the real chip —
# can difference into tunnel noise (a later-process run priced the whole
# ResNet-56 stream at 0.0 ms while the same shapes measured 1.0 ms for
# ResNet-20 minutes earlier). One measurement per (kind, shape, params)
# keeps each process self-consistent: family totals differ only by the
# topology-derived counts.
_EPI_CACHE: dict = {}


def _epi_memo(key, fn):
    if key not in _EPI_CACHE:
        _EPI_CACHE[key] = fn()
    return _EPI_CACHE[key]


def measure_act_site(shape, act_bits: int, impl: str, n1=8, n2=40) -> float:
    """Seconds per act-quant site (f32 conv epilogue -> int8 codes) at this
    shape, elementwise-coupled chain minus the coupling traversal.
    Memoized per (shape, bits, impl, chain) within the process."""
    from alignq_tpu.kernels.infer import _erfq_codes

    def _measure():
        x0 = jnp.asarray(np.random.RandomState(0).randn(*shape), jnp.float32)

        def step(h):
            c = _erfq_codes(h, act_bits, impl)
            return h + c.astype(jnp.float32) * 1e-6

        def null(h):
            return h + h * 1e-6

        t = measure(None, step, x0, n1=n1, n2=n2, quiet=True)
        t0 = measure(None, null, x0, n1=n1, n2=n2, quiet=True)
        return max(t - t0, 0.0)

    return _epi_memo(("act", tuple(shape), act_bits, impl, n1, n2), _measure)


def measure_stream_op(shape, n1=8, n2=40) -> float:
    """Seconds for one residual-stream step (requant + add + relu on int16
    codes) at this shape — the m=4 even-m requant (the tie-bearing case).
    Memoized per (shape, chain) within the process."""
    from alignq_tpu.kernels.infer import _requant_codes

    def _measure():
        k0 = jnp.asarray(
            np.random.RandomState(0).randint(0, 200, shape), jnp.int16
        )

        def step(k):
            r = _requant_codes(k, 4, 127.0)
            out = jnp.maximum(k + r.astype(jnp.int16), 0)
            return out & 255  # bounded feedback

        def null(k):
            return (k + 1) & 255

        t = measure(None, step, k0, n1=n1, n2=n2, quiet=True)
        t0 = measure(None, null, k0, n1=n1, n2=n2, quiet=True)
        return max(t - t0, 0.0)

    return _epi_memo(("stream", tuple(shape), n1, n2), _measure)


def measure_head(batch: int, channels: int = 64, classes: int = 10,
                 n1=8, n2=40) -> float:
    """Seconds for the head (spatial mean + f32 matmul) at (batch, 8, 8, C).
    Memoized per (batch, channels, classes, chain) within the process."""

    def _measure():
        k0 = jnp.asarray(
            np.random.RandomState(0).randint(0, 200, (batch, 8, 8, channels)),
            jnp.int16,
        )
        w = jnp.asarray(
            np.random.RandomState(1).randn(channels, classes) * 0.1,
            jnp.float32,
        )

        def step(k):
            feat = jnp.mean(k.astype(jnp.float32), axis=(1, 2)) * (2.0 / 127.0)
            logits = feat @ w
            s = (jnp.sum(logits) * 1e-20).astype(jnp.int16)
            return k ^ (s & 1)

        def null(k):
            s = (jnp.sum(k.astype(jnp.int32)) & 1).astype(jnp.int16)
            return k ^ s

        t = measure(None, step, k0, n1=n1, n2=n2, quiet=True)
        t0 = measure(None, null, k0, n1=n1, n2=n2, quiet=True)
        return max(t - t0, 0.0)

    return _epi_memo(("head", batch, channels, classes, n1, n2), _measure)


def preact_graph_ceiling(depth: int, batch: int, conv_ceiling_s: float,
                         act_impl: str = "poly", act_bits: int = 8,
                         n1=8, n2=40) -> dict:
    """Epilogue-inclusive ceiling for a PreActResNet INT graph: conv
    speed-of-light + measured mandatory act/stream/head costs. Returns the
    component breakdown (seconds)."""
    act, add, requant = preact_epilogue_inventory(depth, batch)
    act_s = sum(cnt * measure_act_site(s, act_bits, act_impl, n1, n2)
                for s, cnt in act.items())
    stream_s = sum(
        cnt * measure_stream_op(s, n1, n2)
        for s, cnt in {k: add.get(k, 0) + requant.get(k, 0)
                       for k in set(add) | set(requant)}.items()
    )
    head_s = measure_head(batch, n1=n1, n2=n2)
    return {
        "conv_s": conv_ceiling_s, "act_s": act_s, "stream_s": stream_s,
        "head_s": head_s,
        "graph_s": conv_ceiling_s + act_s + stream_s + head_s,
    }


# ---- deployed-graph builders (mirrors tools/model_zoo_bench.py) ------------

def _init_family(name, batch):
    if name in ("resnet20", "resnet56"):
        from alignq_tpu.kernels.infer import (
            build_resnet20_int8,
            convert_preact_resnet,
            resnet20_int8_forward,
        )

        if name == "resnet20":
            _, (qp, x) = build_resnet20_int8(batch)
        else:
            from alignq_tpu.models import resnet56_quant

            model = resnet56_quant(bitW=8, abitW=8, method="ours")
            x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
            v = model.init(jax.random.PRNGKey(1), x, train=False)
            qp = convert_preact_resnet(v["params"], v["batch_stats"])
        fwd = functools.partial(
            resnet20_int8_forward, act_impl="poly", stream="int8"
        )
        return fwd, qp, x
    if name == "densenet40":
        from alignq_tpu.kernels.infer_densenet import (
            convert_densenet40,
            densenet40_int8_forward,
        )
        from alignq_tpu.models import densenet_40_quant

        model = densenet_40_quant(bitW=8, abitW=8, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(1), x, train=False)
        qp = convert_densenet40(v["params"], v["batch_stats"])
        return functools.partial(densenet40_int8_forward, act_impl="poly"), qp, x
    if name == "mobilenetv2":
        from alignq_tpu.kernels.infer_mobilenet import (
            convert_mobilenetv2,
            mobilenetv2_int8_forward,
        )
        from alignq_tpu.models import mobile_v2

        model = mobile_v2(bitW=8, abitW=8, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 32, 32, 3))
        v = model.init(jax.random.PRNGKey(1), x, train=False)
        qp = convert_mobilenetv2(v["params"], v["batch_stats"])
        return functools.partial(mobilenetv2_int8_forward, act_impl="poly"), qp, x
    if name == "resnet50":
        from alignq_tpu.kernels.infer_resnet_imagenet import (
            convert_resnet_imagenet,
            resnet_imagenet_int8_forward,
        )
        from alignq_tpu.models import resnet50_quant

        model = resnet50_quant(bitW=8, abitW=8, method="ours")
        x = jax.random.normal(jax.random.PRNGKey(0), (batch, 224, 224, 3))
        v = model.init(jax.random.PRNGKey(1), x, train=False)
        qp = convert_resnet_imagenet(v["params"], v["batch_stats"])
        return functools.partial(resnet_imagenet_int8_forward, act_impl="poly"), qp, x
    raise ValueError(name)


BATCHES = {"resnet20": 1024, "resnet56": 1024, "densenet40": 1024,
           "mobilenetv2": 1024, "resnet50": 128}


# ---- QAT train-step ceilings (VERDICT r3 item 7) ----------------------------

def _init_qat(family: str, batch: int, mxu_bf16: bool):
    """(carry_step, state, x, y) for the production QAT train step.

    The traced step contains the forward convs PLUS autodiff's transposed
    convs (grad-of-conv = two more convs per site), so the inventory prices
    the full fwd+bwd conv set under the exact dtypes/precision that ship
    (f32 Precision.HIGHEST or bf16-MXU — nn/layers.py QConv)."""
    import jax.random as jr

    from alignq_tpu.models import registry
    from alignq_tpu.train import TrainConfig
    from alignq_tpu.train.state import create_train_state
    from alignq_tpu.train.steps import make_train_step

    target = {"resnet20": "resnet20_quant", "resnet56": "resnet56_quant"}[family]
    cfg = TrainConfig(
        target_model=target, method="ours", bitW=8, abitW=8,
        train_batch_size=batch, eval_batch_size=batch, mxu_bf16=mxu_bf16,
        print_freq=10**6,
    )
    model = registry.build_model(cfg)
    state = create_train_state(
        jr.PRNGKey(0), model, cfg, input_shape=(1, 32, 32, 3),
        steps_per_epoch=100,
    )
    x = jr.normal(jr.PRNGKey(1), (batch, 32, 32, 3), jnp.float32)
    y = jr.randint(jr.PRNGKey(2), (batch,), 0, 10)
    step_fn = make_train_step(model, cfg)
    return step_fn, state, x, y


def _qat_e2e_s(step_fn, state, x, y, n1, n2, reps=3) -> float:
    """Train-step seconds under the chained value-fetch protocol.

    The chain couples through the LOSS (x perturbed by loss*1e-9 each
    iteration, losses accumulated into the fetched scalar), so every step's
    full gradient/optimizer work is live — the two XLA-DCE traps documented
    in tools/qat_breakdown.py (constant-foldable step counter; pruned
    unused-grad contractions) cannot fire."""
    import time

    def prog_for(n):
        @jax.jit
        def prog(state, x):
            acc = 0.0
            for _ in range(n):
                state, m = step_fn(state, x, y)
                x = x + (m["loss"] * 1e-9).astype(x.dtype)
                acc = acc + m["loss"]
            return acc

        return prog

    def timed(n):
        prog = prog_for(n)
        _ = np.asarray(prog(state, x))  # compile + settle
        best = float("inf")
        for r in range(reps):
            xr = x + jnp.float32(r) * 1e-6
            _ = np.asarray(jnp.mean(xr))
            t0 = time.perf_counter()
            _ = np.asarray(prog(state, xr))
            best = min(best, time.perf_counter() - t0)
        return best

    return (timed(n2) - timed(n1)) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families",
                    default="resnet20,resnet56,densenet40,mobilenetv2,resnet50")
    ap.add_argument("--e2e", action="store_true",
                    help="also time each family's full graph (same process)")
    ap.add_argument("--graph", action="store_true",
                    help="epilogue-inclusive GRAPH ceiling for the PreAct "
                         "CIFAR ResNets (VERDICT r4 item 3): conv ceiling + "
                         "measured mandatory act/stream/head costs; with "
                         "--e2e also reports frac_of_graph_ceiling")
    ap.add_argument("--qat", default="",
                    help="comma list of QAT configs to ceiling-price, e.g. "
                         "'resnet20:bf16,resnet20:f32' — inventories the "
                         "full fwd+bwd conv set of the production train "
                         "step and reports frac_of_achievable next to the "
                         "train img/s (VERDICT r3 item 7)")
    ap.add_argument("--qat_batch", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/shape_ceilings.json")
    ap.add_argument("--smoke", action="store_true")
    a = ap.parse_args()

    shape_times: dict = {}  # key -> seconds (cached across families)
    report = {"shapes": [], "models": {}}
    n1, n2 = (1, 2) if a.smoke else (8, 40)

    for spec in filter(None, a.qat.split(",")):
        fam, prec = spec.strip().split(":")
        batch = 8 if a.smoke else a.qat_batch
        step_fn, state, x, y = _init_qat(fam, batch, mxu_bf16=(prec == "bf16"))

        def traced(state, x=x, y=y, step_fn=step_fn):
            new_state, m = step_fn(state, x, y)
            return new_state

        inv = conv_inventory(traced, state)
        ceiling_s = 0.0
        rows = []
        for key, count in sorted(inv.items(),
                                 key=lambda kv: -shape_flops(kv[0]) * kv[1]):
            if key not in shape_times:
                shape_times[key] = measure_shape(key, n1=n1, n2=n2)
            t = shape_times[key]
            rows.append({
                "lhs": key[0], "rhs": key[1], "out": key[2],
                "dtype": key[9], "precision": key[11], "count": count,
                "us_per_conv": round(t * 1e6, 1),
                "achievable_tops": round(
                    shape_flops(key) / max(t, 1e-12) / 1e12, 1),
                "total_ms": round(count * t * 1e3, 3),
            })
            ceiling_s += count * t
        name = f"{fam}_qat_{prec}"
        e2e = _qat_e2e_s(step_fn, state, x, y,
                         n1=1 if a.smoke else 2, n2=2 if a.smoke else 8,
                         reps=1 if a.smoke else 3)
        model_row = {
            "family": name, "batch": batch,
            "ceiling_ms": round(ceiling_s * 1e3, 3),
            "n_distinct_shapes": len(inv),
            "e2e_ms": round(e2e * 1e3, 3),
            "frac_of_achievable": round(ceiling_s / e2e, 4),
            "imgs_per_sec": round(batch / e2e, 1),
        }
        report["models"][name] = model_row
        report["shapes"].append({"family": name, "rows": rows})
        print(json.dumps(model_row), flush=True)
        for r in rows:
            print(json.dumps(r), flush=True)

    for fam in filter(None, (f.strip() for f in a.families.split(","))):
        batch = 8 if a.smoke else BATCHES[fam]
        fwd, qp, x = _init_family(fam, batch)
        inv = conv_inventory(fwd, qp, x)
        ceiling_s = 0.0
        rows = []
        for key, count in sorted(inv.items(), key=lambda kv: -shape_flops(kv[0]) * kv[1]):
            if key not in shape_times:
                shape_times[key] = measure_shape(key, n1=n1, n2=n2)
            t = shape_times[key]
            fl = shape_flops(key)
            rows.append({
                "lhs": key[0], "rhs": key[1], "strides": key[3],
                "fgc": key[7], "dtype": key[9],
                "count": count, "us_per_conv": round(t * 1e6, 1),
                "achievable_tops": round(fl / max(t, 1e-12) / 1e12, 1),
                "total_ms": round(count * t * 1e3, 3),
            })
            ceiling_s += count * t
        model_row = {
            "family": fam, "batch": batch,
            "ceiling_ms": round(ceiling_s * 1e3, 3),
            "n_distinct_shapes": len(inv),
        }
        if a.e2e:
            def step(x, fwd=fwd, qp=qp):
                out = fwd(qp, x)
                return x + (jnp.mean(out) * 1e-6).astype(x.dtype)

            e2e = measure(None, step, x, n1=2 if a.smoke else 4,
                          n2=4 if a.smoke else 16, quiet=True)
            model_row["e2e_ms"] = round(e2e * 1e3, 3)
            model_row["frac_of_achievable"] = round(ceiling_s / e2e, 4)
            model_row["imgs_per_sec"] = round(batch / e2e, 1)
        if a.graph and fam in ("resnet20", "resnet56"):
            depth = 20 if fam == "resnet20" else 56
            gc = preact_graph_ceiling(depth, batch, ceiling_s,
                                      act_impl="poly", n1=n1, n2=n2)
            epi_s = gc["act_s"] + gc["stream_s"] + gc["head_s"]
            model_row["epilogue_isolated_ms"] = round(epi_s * 1e3, 3)
            model_row["composition_bound_ms"] = round(gc["graph_s"] * 1e3, 3)
            model_row["epilogue_breakdown_ms"] = {
                k[:-2]: round(v * 1e3, 3) for k, v in gc.items()
                if k != "graph_s"
            }
            if "e2e_ms" in model_row:
                # RESIDUAL ACCOUNT (VERDICT r4 item 3): the e2e time above
                # the conv ceiling, divided by the ISOLATED cost of the
                # mandatory epilogue work (act sites + stream + head).
                # <= 1 means the whole residual is attributable to measured
                # mandatory ops — and its value is the fraction of the
                # standalone epilogue cost the graph actually pays after
                # XLA fuses it into the conv epilogues (measured ~0.4-0.65:
                # e2e BEATS conv+epilogue composition, which is why a
                # naive "graph ceiling = conv + isolated epilogues" reads
                # frac > 1 and is NOT a ceiling).
                resid_s = model_row["e2e_ms"] / 1e3 - ceiling_s
                model_row["residual_ms"] = round(resid_s * 1e3, 3)
                model_row["residual_vs_mandatory"] = round(
                    resid_s / max(epi_s, 1e-9), 4
                )
                model_row["residual_accounted"] = bool(
                    resid_s <= epi_s * 1.1  # 10% protocol-noise allowance
                )
        report["models"][fam] = model_row
        report["shapes"].append({"family": fam, "rows": rows})
        print(json.dumps(model_row), flush=True)
        for r in rows:
            print(json.dumps(r), flush=True)

    with open(a.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
