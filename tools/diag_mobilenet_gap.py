"""Localize the MobileNetV2 deploy-exact QAT <-> INT-graph divergence.

The W4A4 deploy-exact export measured 95.7% prediction agreement
(+0.59 pts) where the ResNet/DenseNet families measure 100.00%. This tool
trains the same 1-epoch synthetic config, then walks BOTH forwards over one
eval batch collecting per-site activation codes:

- QAT side: flax capture_intermediates on every QuantAct output,
  codes = round(value / (act_range/g));
- INT side: a re-run of kernels/infer_mobilenet.mobilenetv2_int8_forward
  inlined here with per-site code collection.

Reports, per site in topological order, the fraction of mismatching codes
and the max |code delta| — the FIRST site with structural (non-boundary)
mismatch is the bug; a slow depth-growing fraction of +-1 flips is erf
boundary fp noise (accumulation-order differences between the f32 QAT conv
and the int8+epilogue deploy conv).

    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/diag_mobilenet_gap.py --bits 4
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def int_forward_with_sites(qparams, x, act_bits, act_impl="erf"):
    """mobilenetv2_int8_forward (kernels/infer_mobilenet.py) with per-site
    code collection. Keep in lockstep with the production graph."""
    from alignq_tpu.kernels.infer import _act_g, _erfq_codes, _linear_q, _requant_codes
    from alignq_tpu.kernels.infer_mobilenet import _conv

    sites = {}
    g = _act_g(act_bits)
    act_scale = 2.0 / g

    h = _conv(_linear_q(x, 3.0 / 127.0), qparams["conv1"], 1, 1)
    out_c = jnp.maximum(_erfq_codes(h, act_bits, act_impl).astype(jnp.int16), 0)
    sites["stem/act_q1(relu)"] = out_c
    m_in = 1

    for i, blk in enumerate(qparams["blocks"]):
        s = 1 if "shortcut" in blk else 2
        x8 = _requant_codes(out_c, m_in, g, signed=True)
        sites[f"layers_{i}/in_requant"] = x8
        planes = blk["conv2"].kernel_int8.shape[-1]

        h = _conv(x8, blk["conv1"], 1, 0)
        a = _erfq_codes(h, act_bits, act_impl)
        r = jnp.maximum(a, 0)
        sites[f"layers_{i}/act_q1(relu)"] = r

        h = _conv(r.astype(jnp.int8), blk["conv2"], s, 1, groups=planes)
        a = _erfq_codes(h, act_bits, act_impl)
        r = jnp.maximum(a, 0)
        sites[f"layers_{i}/act_q2(relu)"] = r

        h = _conv(r.astype(jnp.int8), blk["conv3"], 1, 0)
        a3_c = _erfq_codes(h, act_bits, act_impl).astype(jnp.int16)
        sites[f"layers_{i}/act_q3"] = a3_c

        if "shortcut" in blk:
            sc_h = _conv(x8, blk["shortcut"], 1, 0)
            sc_c = jnp.maximum(
                _erfq_codes(sc_h, act_bits, act_impl).astype(jnp.int16), 0
            )
            sites[f"layers_{i}/act_skip(relu)"] = sc_c
            out_c = a3_c + sc_c
            m_in = 2
        else:
            out_c = a3_c
            m_in = 1

    hq = _requant_codes(out_c, m_in, g, signed=True)
    sites["head/in_requant"] = hq
    h = _conv(hq, qparams["conv2"], 1, 0)
    out = jnp.maximum(_erfq_codes(h, act_bits, act_impl).astype(jnp.int16), 0)
    sites["head/act_q2(relu)"] = out
    feat = jnp.mean(out.astype(jnp.float32), axis=(1, 2)) * act_scale
    logits = feat @ qparams["linear"]["kernel"] + qparams["linear"]["bias"]
    return logits, sites


def main():
    sys.path.insert(0, "/root/repo")
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, default=4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--lr", type=float, default=0.04)
    p.add_argument("--warmup_epochs", type=float, default=0.0)
    a = p.parse_args()

    from alignq_tpu.data.registry import get_data
    from alignq_tpu.kernels.infer_mobilenet import (
        convert_mobilenetv2,
        mobilenetv2_int8_forward,
    )
    from alignq_tpu.models import mobile_v2
    from alignq_tpu.train import TrainConfig
    from alignq_tpu.train.loop import fit

    cfg = TrainConfig(
        target_model="mobile_v2", method="ours", bitW=a.bits, abitW=a.bits,
        variant="int8", dataset="synthetic", num_epochs=a.epochs,
        train_batch_size=a.batch, eval_batch_size=a.batch,
        job_dir="/tmp/alignq_diag_mb", print_freq=1000,
        correction_exclude=(), deploy_exact=True,
        lr=a.lr, warmup_epochs=a.warmup_epochs,
    )
    data = get_data(cfg.dataset, cfg.data_dir, cfg.train_batch_size,
                    cfg.eval_batch_size, cfg.seed)
    model = mobile_v2(bitW=a.bits, abitW=a.bits, method="ours", variant="int8",
                      deploy_exact=True)
    result = fit(cfg, data, model=model)
    state = result["state"]

    qparams = convert_mobilenetv2(
        state.params, state.batch_stats, weight_bits=a.bits, act_bits=a.bits
    )
    g = float(2 ** (a.bits - 1) - 1)
    act_scale = 2.0 / g

    xb, yb = next(iter(data.loader_test))
    x = jnp.asarray(xb)

    logits_i8, int_sites = jax.jit(
        lambda q, x: int_forward_with_sites(q, x, a.bits)
    )(qparams, x)
    # cross-check the inlined walk against the production graph
    prod = mobilenetv2_int8_forward(qparams, x, act_bits=a.bits)
    assert np.array_equal(np.asarray(prod), np.asarray(logits_i8)), (
        "diagnostic walk diverged from the production INT graph"
    )

    logits_fq, mods = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        x, train=False, capture_intermediates=True, mutable=["intermediates"],
    )
    inter = mods["intermediates"]

    def fq_codes(path):
        node = inter
        for part in path:
            node = node[part]
        v = node["__call__"][0]
        return np.round(np.asarray(v) / act_scale).astype(np.int32)

    # map QAT sites -> INT sites (topological order)
    pairs = [("stem/act_q1(relu)", np.maximum(fq_codes(("act_q1",)), 0))]
    n_blocks = len(qparams["blocks"])
    for i in range(n_blocks):
        blk = qparams["blocks"][i]
        base = (f"layers_{i}",)
        pairs.append(
            (f"layers_{i}/act_q1(relu)",
             np.maximum(fq_codes(base + ("act_q1",)), 0)))
        pairs.append(
            (f"layers_{i}/act_q2(relu)",
             np.maximum(fq_codes(base + ("act_q2",)), 0)))
        pairs.append((f"layers_{i}/act_q3", fq_codes(base + ("act_q3",))))
        if "shortcut" in blk:
            pairs.append(
                (f"layers_{i}/act_skip(relu)",
                 np.maximum(fq_codes(base + ("act_skip",)), 0)))
    pairs.append(("head/act_q2(relu)", np.maximum(fq_codes(("act_q2",)), 0)))

    print(f"\n{'site':36s} {'mismatch%':>10s} {'max|d|':>7s}")
    for name, qat_c in pairs:
        int_c = np.asarray(int_sites[name]).astype(np.int32)
        mism = (qat_c != int_c)
        frac = 100.0 * mism.mean()
        maxd = int(np.abs(qat_c - int_c).max()) if mism.any() else 0
        flag = "  <-- " if frac > 1.0 else ""
        print(f"{name:36s} {frac:9.3f}% {maxd:7d}{flag}")

    pa = 100.0 * (np.argmax(np.asarray(logits_fq), -1)
                  == np.argmax(np.asarray(logits_i8), -1)).mean()
    print(f"\nbatch prediction agreement: {pa:.1f}%")


if __name__ == "__main__":
    main()
