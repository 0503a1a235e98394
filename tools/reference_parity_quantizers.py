"""Baseline quantizer families (C18-C22, C24) against the ACTUAL reference
code — forwards AND gradients.

quant/baselines.py reimplements the reference's six baseline quantizer
files (cdf_alignment_admm/resnet-20-cifar-10/model/quantization_{uniform,
dorefa,lsq,apot,llsq,bwn,bwnf,uniform_admm}.py); until now each was
verified against closed forms and the builder's reading. This harness
imports the reference's own modules (argv-controlled options singleton,
CPU device patch — same shims as tools/reference_parity.py) and compares,
at f64 on random tensors:

- forward values,
- gradients w.r.t. the input (through each custom autograd Function's
  backward: STE identities, LSQ's clip masks, APoT's clip-region split,
  LLSQ's pass-through), and
- gradients w.r.t. the learnable quantizer parameters where they exist
  (LSQ step size s with its 1/sqrt(numel*Qp) grad-scale trick; APoT
  wgt_alpha/act_alpha custom backward; LLSQ per-channel alpha octave
  search El/Em/Er),

against the matching quant/baselines.py functions. Layout notes: torch
weights are OIHW, ours HWIO (transposed before compare); LLSQ alpha is
(Cout,1,1,1) there and (1,1,1,Cout) here.

Gradient probe: loss = sum(q * r) for a fixed random cotangent r, so
dL/dx and dL/dparam compare the full VJPs, not just sums.

Usage (CPU, ~1 min):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_parity_quantizers.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from importlib import import_module

REF = "/root/reference/cdf_alignment_admm/resnet-20-cifar-10"
REPO = "/root/repo"
ATOL, RTOL = 1e-12, 1e-10  # pure elementwise math at f64

_job = tempfile.mkdtemp(prefix="refparity_q_")
sys.argv = ["main.py", "--job_dir", _job, "--bitW", "4", "--abitW", "4",
            "--train_batch_size", "8", "--print_freq", "1000000"]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RESULTS = []
_rng = np.random.RandomState(0)


def _mod(name):
    m = import_module(f"model.{name}")
    if hasattr(m, "device"):
        m.device = torch.device("cpu")
    return m


def check(name, got, want):
    got = np.asarray(got)
    want = want.detach().numpy() if isinstance(want, torch.Tensor) else np.asarray(want)
    d = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = bool(np.allclose(got, want, atol=ATOL, rtol=RTOL))
    RESULTS.append({"check": name, "max_abs_delta": d, "pass": ok})
    print(json.dumps(RESULTS[-1]), flush=True)


def t64(a):
    return torch.tensor(a, dtype=torch.float64, requires_grad=True)


def torch_vjp(fn, *tensors):
    out = fn(*tensors)
    r = torch.tensor(_rng.RandomState if False else _rng.randn(*out.shape))
    (out * r).sum().backward()
    return out, r.numpy(), [t.grad.detach().numpy() if t.grad is not None else None
                            for t in tensors]


def jax_vjp(fn, r, *arrays):
    out, vjp = jax.vjp(fn, *arrays)
    grads = vjp(jnp.asarray(r))
    return out, grads


def main():
    w_oihw = _rng.randn(16, 8, 3, 3)
    w_hwio = np.transpose(w_oihw, (2, 3, 1, 0)).copy()
    a_in = _rng.randn(4, 8, 8, 8) * 1.5  # NHWC-ish, layout-free elementwise

    from alignq_tpu.quant import baselines as B

    with jax.enable_x64(True):
        # ---- uniform (C18) + its act -------------------------------------
        qu = _mod("quantization_uniform")
        for bit in (4, 8):
            tw = t64(w_oihw)
            out, r, (gw,) = torch_vjp(qu.weight_quantize_fn(bit, "second").double(), tw)
            jout, (jgw,) = jax_vjp(lambda w: B.uniform_weight(w, bit), r, jnp.asarray(w_oihw))
            check(f"uniform.w{bit}.fwd", jout, out)
            check(f"uniform.w{bit}.grad_w", jgw, gw)
            ta = t64(a_in)
            out, r, (ga,) = torch_vjp(qu.activation_quantize_fn(bit, "second").double(), ta)
            jout, (jga,) = jax_vjp(lambda a: B.uniform_act(a, bit), r, jnp.asarray(a_in))
            check(f"uniform.a{bit}.fwd", jout, out)
            check(f"uniform.a{bit}.grad_a", jga, ga)

        # ---- dorefa (C18) -------------------------------------------------
        qd = _mod("quantization_dorefa")
        tw = t64(w_oihw)
        out, r, (gw,) = torch_vjp(qd.weight_quantize_fn(4, "second").double(), tw)
        jout, (jgw,) = jax_vjp(lambda w: B.dorefa_weight(w, 4), r, jnp.asarray(w_oihw))
        check("dorefa.w4.fwd", jout, out)
        check("dorefa.w4.grad_w", jgw, gw)
        ta = t64(a_in)
        out, r, (ga,) = torch_vjp(qd.activation_quantize_fn(4, "second").double(), ta)
        jout, (jga,) = jax_vjp(lambda a: B.uniform_act(a, 4), r, jnp.asarray(a_in))
        check("dorefa.a4.fwd", jout, out)
        check("dorefa.a4.grad_a", jga, ga)

        # ---- bwn / bwnf (C22): per-tensor vs per-filter alpha -------------
        for name, fn in (("bwn", B.bwn_weight), ("bwnf", B.bwnf_weight)):
            qb = _mod(f"quantization_{name}")
            tw = t64(w_oihw)
            out, r, (gw,) = torch_vjp(qb.weight_quantize_fn(1, "second").double(), tw)
            jout, (jgw,) = jax_vjp(
                lambda w: jnp.transpose(fn(jnp.transpose(w, (2, 3, 1, 0)), 1),
                                        (3, 2, 0, 1)),
                r, jnp.asarray(w_oihw))
            check(f"{name}.w1.fwd", jout, out)
            check(f"{name}.w1.grad_w", jgw, gw)

        # ---- LSQ (C19): learnable s with the grad-scale trick -------------
        ql = _mod("quantization_lsq")
        for is_act, x_np in ((False, w_oihw), (True, a_in)):
            m = ql.LSQ_Quantizer(4, is_act).double()
            m.init_step_size(torch.tensor(x_np, dtype=torch.float64))
            s0 = float(m.s.detach())
            tx = t64(x_np)
            out = m(tx)
            r = _rng.randn(*out.shape)
            (out * torch.tensor(r)).sum().backward()
            gx, gs = tx.grad.numpy(), m.s.grad.numpy()
            s_init = B.lsq_init_step(jnp.asarray(x_np), 4, is_activation=is_act)
            check(f"lsq.{'a' if is_act else 'w'}.s_init", s_init, np.float64(s0))
            jout, (jgx, jgs) = jax_vjp(
                lambda x, s: B.lsq_quantize(x, s, 4, is_activation=is_act),
                r, jnp.asarray(x_np), jnp.asarray(np.float64(s0)))
            check(f"lsq.{'a' if is_act else 'w'}.fwd", jout, out)
            check(f"lsq.{'a' if is_act else 'w'}.grad_x", jgx, gx)
            check(f"lsq.{'a' if is_act else 'w'}.grad_s", jgs.reshape(-1), gs.reshape(-1))

        # ---- APoT (C20): level table, weight path, act path ---------------
        qa = _mod("quantization_apot")
        for b in (2, 3, 4, 5):
            # the reference materializes the table in f32 (torch.Tensor of
            # exact python-float sums, then a /max normalize); our f64 table
            # must round to EXACTLY those f32 values
            check(f"apot.table.b{b}",
                  np.sort(B.build_power_value(b, True)).astype(np.float32),
                  np.sort(qa.build_power_value(b, True).numpy()))
        # weight: w_bit=4 -> b=3 power mode, mean/std normalize, alpha=3.0
        wq_mod = qa.weight_quantize_fn(4, stage="second", power=True).double()
        tw = t64(w_oihw)
        out = wq_mod(tw)
        r = _rng.randn(*out.shape)
        (out * torch.tensor(r)).sum().backward()
        gw, galpha = tw.grad.numpy(), wq_mod.wgt_alpha.grad.numpy()
        jout, (jgw, jga) = jax_vjp(
            lambda w, al: B.apot_weight(w, al, 4), r,
            jnp.asarray(w_oihw), jnp.asarray(3.0, jnp.float64))
        check("apot.w4.fwd", jout, out)
        check("apot.w4.grad_w", jgw, gw)
        check("apot.w4.grad_alpha", jga.reshape(-1), galpha.reshape(-1))
        # act: b=3 grid, alpha=8.0 (conv2d_Q_fn defaults, apot.py:168-177)
        grid = qa.build_power_value(3, True)
        act_fn = qa.activation_quantize_fn(3, "second", grid.double(), power=True)
        ta = t64(np.abs(a_in) * 4)
        talpha = t64(np.float64(8.0))
        out = act_fn(ta, talpha)
        r = _rng.randn(*out.shape)
        (out * torch.tensor(r)).sum().backward()
        jout, (jga_, jgal) = jax_vjp(
            lambda a, al: B.apot_act_quant(a, al, 3, True), r,
            jnp.asarray(np.abs(a_in) * 4), jnp.asarray(8.0, jnp.float64))
        check("apot.a3.fwd", jout, out)
        check("apot.a3.grad_a", jga_, ta.grad.numpy())
        check("apot.a3.grad_alpha", jgal.reshape(-1), talpha.grad.numpy().reshape(-1))

        # ---- LLSQ (C21): octave-search alpha backward ---------------------
        qz = _mod("quantization_llsq")
        bit = 4
        pwr = 2 ** (bit - 1)
        alpha_np = np.abs(_rng.randn(16, 1, 1, 1)) * 0.2 + 0.05
        tw = t64(w_oihw)
        talpha = t64(alpha_np)
        out = qz.RoundFn_LLSQ.apply(tw, talpha, pwr, bit)
        r = _rng.randn(*out.shape)
        (out * torch.tensor(r)).sum().backward()
        jout, (jgw, jgal) = jax_vjp(
            lambda w, al: jnp.transpose(
                B.llsq_weight_quant(jnp.transpose(w, (2, 3, 1, 0)),
                                    al.reshape(1, 1, 1, 16), bit, True),
                (3, 2, 0, 1)),
            r, jnp.asarray(w_oihw), jnp.asarray(alpha_np, jnp.float64))
        check("llsq.w4.fwd", jout, out)
        check("llsq.w4.grad_w", jgw, tw.grad.numpy())
        check("llsq.w4.grad_alpha", jgal.reshape(-1), talpha.grad.numpy().reshape(-1))
        # quan_alpha itself, like-for-like at 16 bits (the module-level
        # quan_alpha; NOTE quan_fn_alpha() defaults to bit=32 and does NOT
        # shortcut — on f32 alphas its 32-bit grid is lossless, so our
        # bits==32 identity shortcut is the same semantics)
        check("llsq.quan_alpha16",
              B.quan_alpha(jnp.asarray(alpha_np.reshape(-1), jnp.float64), 16),
              qz.quan_alpha(torch.tensor(alpha_np, dtype=torch.float64), 16).reshape(-1))

        # ---- uniform+ADMM ablation act (C24): unclamped uniform_q ---------
        qua = _mod("quantization_uniform_admm")
        from alignq_tpu.quant.ste import uniform_quantize

        ta = t64(a_in)
        out = qua.uniform_quantize(4)(ta)
        r = _rng.randn(*out.shape)
        (out * torch.tensor(r)).sum().backward()
        jout, (jga,) = jax_vjp(lambda a: uniform_quantize(a, 4), r, jnp.asarray(a_in))
        check("uniform_admm.uq4.fwd", jout, out)
        check("uniform_admm.uq4.grad", jga, ta.grad.numpy())

    ok = all(rec["pass"] for rec in RESULTS)
    print(json.dumps({"pass": ok, "checks": len(RESULTS)}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
