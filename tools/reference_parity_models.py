"""DenseNet-40 and MobileNetV2 topologies against the ACTUAL reference
model code — forward values and full gradients.

Completes the real-code model-family coverage (PreAct ResNets via
tools/reference_parity.py, ImageNet ResNet-50 via reference_parity_dann.py,
digit CNN via reference_parity_digit.py): this harness builds the
reference's OWN DenseNet (dense-cifar-10/model/densenet.py:15-158) or
MobileNetV2 (mobilenet-v2-svhn/model/mobilenetV2.py:25-135) with its own
variant-a quantization module, runs one f64 forward + CE backward, and
compares logits and EVERY parameter gradient against the framework model
(models/densenet.py / models/mobilenetv2.py, variant='a') from identical
weights.

Why gradient-level (not a train() trajectory): these projects' drivers are
UNRUNNABLE as committed — their corrected SGD harvests
`quantize_fn.weight_cdf`, which the variant-a quantizer never stores
(AttributeError; SURVEY.md 2.4.1). Forward+backward parity through the
models plus the optimizer verified twice elsewhere (reference_parity.py,
reference_parity_dann.py) covers everything these projects' code adds.

One family per process (--family): the two projects both define top-level
`utils`/`model` packages whose options singletons differ.

Bit-width note (measured, not hand-waved): DenseNet-40 passes at W4A4
(1.5e-15 over 119 grads); MobileNetV2 passes at W8A8 (1.4e-11 over 203
grads) and FP32 (8e-12) but NOT at W4A4 — and the reason is a structural
rounding tie, localized with per-module hooks: at 4-bit, ReLU6 saturation
produces CONSTANT channels whose train-mode BN output is exactly 0, and
variant-a's act quantizer puts Phi(0)*15 = 7.5 EXACTLY on a rounding
boundary (block 14's act_q2 and act_skip flip first, one grid step each).
Both frameworks round the exact tie identically (half-even), but the
1e-15 BLAS-vs-XLA accumulation dust on either side of it differs, so
cross-framework bit-parity at W4A4 is precluded for this net by the same
measure-class argument as tests/test_trajectory_parity_full.py's jit-FMA
note — a tie-dust artifact, not a semantics difference (blocks 0-13 match
at 0.0 before the first tie).

Usage (CPU, <2 min each):
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_parity_models.py --family densenet40
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/reference_parity_models.py --family mobilenetv2
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

REPO = "/root/repo"
ATOL, RTOL = 1e-9, 1e-7  # f64 conv accumulation-order noise over 40 layers

ap = argparse.ArgumentParser()
ap.add_argument("--family", choices=("densenet40", "mobilenetv2"),
                required=True)
ap.add_argument("--bits", type=int, default=4)
ap.add_argument("--batch", type=int, default=4)
HARNESS = ap.parse_args()

REF = {
    "densenet40": "/root/reference/cdf_alignment/dense-cifar-10",
    "mobilenetv2": "/root/reference/cdf_alignment/mobilenet-v2-svhn",
}[HARNESS.family]

_job = tempfile.mkdtemp(prefix="refparity_m_")
sys.argv = ["main.py", "--job_dir", _job,
            "--bitW", str(HARNESS.bits), "--abitW", str(HARNESS.bits),
            "--print_freq", "1000000"]
sys.path.insert(0, REPO)
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

from utils.options import args as ref_args  # noqa: E402

if HARNESS.family == "densenet40":
    import model.densenet as ref_model_mod  # noqa: E402
else:
    import model.mobilenetV2 as ref_model_mod  # noqa: E402
import model.quantization as ref_quant  # noqa: E402

_cpu = torch.device("cpu")
for m in (ref_model_mod, ref_quant):
    if hasattr(m, "device"):
        m.device = _cpu


def build_reference():
    torch.manual_seed(0)
    if HARNESS.family == "densenet40":
        net = ref_model_mod.densenet_40_quant(
            bitW=ref_args.bitW, abitW=ref_args.abitW, stage=ref_args.stage)
    else:
        net = ref_model_mod.mobile_v2(
            wbit=ref_args.bitW, abit=ref_args.abitW, stage=ref_args.stage)
    return net.double()


def conv(m, jnp):
    return {"kernel": jnp.asarray(
        m.weight.detach().numpy().transpose(2, 3, 1, 0).copy())}


def bn(m, jnp):
    return {"scale": jnp.asarray(m.weight.detach().numpy().copy()),
            "bias": jnp.asarray(m.bias.detach().numpy().copy())}


def map_densenet(tnet, jnp):
    p = {"conv1": conv(tnet.conv1, jnp)}
    for s in (1, 2, 3):
        for i, blk in enumerate(getattr(tnet, f"dense{s}")):
            p[f"dense{s}_{i}"] = {"bn1": bn(blk.bn1, jnp),
                                  "conv1": conv(blk.conv1, jnp)}
        if s < 3:
            t = getattr(tnet, f"trans{s}")
            p[f"trans{s}"] = {"bn1": bn(t.bn1, jnp), "conv1": conv(t.conv1, jnp)}
    p["bn"] = bn(tnet.bn, jnp)
    p["fc"] = {"kernel": jnp.asarray(tnet.fc.weight.detach().numpy().T.copy()),
               "bias": jnp.asarray(tnet.fc.bias.detach().numpy().copy())}
    return p


def map_mobilenet(tnet, jnp):
    p = {"conv1": conv(tnet.conv1, jnp), "bn1": bn(tnet.bn1, jnp)}
    for i, blk in enumerate(tnet.layers):
        d = {"conv1": conv(blk.conv1, jnp), "bn1": bn(blk.bn1, jnp),
             "conv2": conv(blk.conv2, jnp), "bn2": bn(blk.bn2, jnp),
             "conv3": conv(blk.conv3, jnp), "bn3": bn(blk.bn3, jnp)}
        if blk.shortcut is not None:
            d["shortcut_conv"] = conv(blk.shortcut[0], jnp)
            d["shortcut_bn"] = bn(blk.shortcut[1], jnp)
        p[f"layers_{i}"] = d
    p["conv2"] = conv(tnet.conv2, jnp)
    p["bn2"] = bn(tnet.bn2, jnp)
    p["linear"] = {
        "kernel": jnp.asarray(tnet.linear.weight.detach().numpy().T.copy()),
        "bias": jnp.asarray(tnet.linear.bias.detach().numpy().copy())}
    return p


def main():
    import jax
    import jax.numpy as jnp

    from alignq_tpu.quant.ste import dequant_division
    from alignq_tpu.train.steps import cross_entropy_loss

    rng = np.random.RandomState(0)
    x = rng.randn(HARNESS.batch, 3, 32, 32)
    y = rng.randint(0, 10, HARNESS.batch)

    tnet = build_reference()
    tnet.train()
    out_t = tnet(torch.tensor(x))
    loss_t = torch.nn.functional.cross_entropy(out_t, torch.tensor(y))
    loss_t.backward()
    tg = {n: p.grad.detach().numpy().copy()
          for n, p in tnet.named_parameters() if p.grad is not None}

    with jax.enable_x64(True):
        if HARNESS.family == "densenet40":
            from alignq_tpu.models import densenet_40_quant

            model = densenet_40_quant(bitW=HARNESS.bits, abitW=HARNESS.bits,
                                      method="ours", variant="a",
                                      act_range=ref_args.act_range)
            params = map_densenet(tnet, jnp)
        else:
            from alignq_tpu.models import mobile_v2

            model = mobile_v2(bitW=HARNESS.bits, abitW=HARNESS.bits,
                              method="ours", variant="a",
                              act_range=ref_args.act_range)
            params = map_mobilenet(tnet, jnp)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                       train=False)
        bs = jax.tree.map(lambda a: a.astype(jnp.float64), v["batch_stats"])

        def loss_fn(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": bs},
                jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return cross_entropy_loss(logits, jnp.asarray(y)), logits

        with dequant_division():
            (loss_j, logits_j), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)

        deltas = {"logits": float(np.max(np.abs(
            np.asarray(logits_j) - out_t.detach().numpy())))}
        ok = np.allclose(np.asarray(logits_j), out_t.detach().numpy(),
                         atol=ATOL, rtol=RTOL)
        ok &= abs(float(loss_j) - float(loss_t)) < 1e-9

        def jget(path):
            node = grads
            for k in path:
                node = node[k]
            return np.asarray(node)

        n_checked = 0
        for tname, g in tg.items():
            parts = tname.split(".")
            # torch 'dense1.0.conv1.weight' -> flax ('dense1_0','conv1')
            if parts[0] in ("dense1", "dense2", "dense3", "layers"):
                head = (f"{parts[0]}_{parts[1]}"
                        if parts[0].startswith("dense")
                        else f"layers_{parts[1]}")
                rest = parts[2:]
            else:
                head, rest = parts[0], parts[1:]
            leafname = rest[-1]
            mods = rest[:-1]
            if mods and mods[0] == "shortcut":
                mods = ["shortcut_conv" if rest[1] == "0" else "shortcut_bn"]
                mods = [mods[0]]
                path = [head] + mods
            elif mods:
                path = [head] + mods
            else:
                path = [head]
            node = params
            for k in path:
                node = node[k]
            if "kernel" in node and leafname == "weight" and g.ndim == 4:
                jg = jget(path + ["kernel"]).transpose(3, 2, 0, 1)
            elif leafname == "weight" and g.ndim == 2:
                jg = jget(path + ["kernel"]).T
            elif leafname == "weight":
                jg = jget(path + ["scale"])
            else:
                jg = jget(path + [leafname])
            d = float(np.max(np.abs(jg - g)))
            deltas[tname] = d
            ok &= bool(np.allclose(jg, g, atol=ATOL, rtol=RTOL))
            n_checked += 1

        worst = max(deltas, key=deltas.get)
        print(json.dumps({
            "family": HARNESS.family, "grads_checked": n_checked,
            "max_abs_delta": deltas[worst], "worst": worst,
            "loss_delta": abs(float(loss_j) - float(loss_t)),
            "pass": bool(ok),
        }), flush=True)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
