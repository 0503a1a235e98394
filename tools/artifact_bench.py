"""Artifact-path benchmark: bytes and costs of every weight format, through
the serving stack (VERDICT r3 item 6, "the compression half of a
quantization framework's story").

For ResNet-20 (the headline family) this measures:
  - artifact BYTES: f32 params, W8A8 int8 codes, W4A4 int8-stored codes,
    W4A4 nibble-packed — both raw in-memory bytes and on-disk npz
    (uncompressed, so the numbers are storage, not zlib luck);
  - PACK/UNPACK cost: host wall time of pack_qparams_int4 /
    unpack_qparams_int4 over the full kernel set (one-time export/load
    costs), and the in-graph unpack overhead is visible in the zoo bench's
    resnet20_w4a4_packed row vs the unpacked w4a4_bins row;
  - SERVE smoke: engine_from_artifact() on the packed artifact answers
    requests with logits equal to the unpacked engine's (the packed format
    is transparent at the API boundary).

No reference equivalent: the reference's deployment story stops at
fake-quant eval (its *_admm quantize() never materializes integer
artifacts); this is the framework's own export/serve surface
(kernels/artifact.py, kernels/convert.py, serve.py).

Usage:
  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/artifact_bench.py
  (TPU env works too, but every number here is host-side.)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def tree_bytes(tree) -> int:
    return int(sum(np.asarray(l).nbytes for l in jax.tree.leaves(tree)))


def npz_bytes(tree, path) -> int:
    """On-disk bytes with the artifact key scheme, UNcompressed."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p))))
            for p in kp
        )
        flat[key] = np.asarray(leaf)
    np.savez(path, **flat)
    return os.path.getsize(path)


def main():
    from alignq_tpu.kernels.convert import (
        pack_qparams_int4,
        unpack_qparams_int4,
    )
    from alignq_tpu.kernels.infer import convert_resnet20, resnet20_int8_forward
    from alignq_tpu.models import resnet20_quant

    tmp = tempfile.mkdtemp(prefix="artifact_bench_")
    rows = []

    x1 = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3), jnp.float32)

    # f32 baseline: the QAT master weights
    m8 = resnet20_quant(bitW=8, abitW=8, method="ours")
    v8 = m8.init(jax.random.PRNGKey(1), x1, train=False)
    f32_tree = {"params": v8["params"], "batch_stats": v8["batch_stats"]}
    rows.append({
        "format": "f32_params",
        "raw_bytes": tree_bytes(f32_tree),
        "npz_bytes": npz_bytes(f32_tree, f"{tmp}/f32.npz"),
    })

    qp8 = convert_resnet20(v8["params"], v8["batch_stats"])
    rows.append({
        "format": "w8a8_int8",
        "raw_bytes": tree_bytes(qp8),
        "npz_bytes": npz_bytes(qp8, f"{tmp}/w8.npz"),
    })

    m4 = resnet20_quant(bitW=4, abitW=4, method="ours")
    v4 = m4.init(jax.random.PRNGKey(1), x1, train=False)
    qp4 = convert_resnet20(
        v4["params"], v4["batch_stats"], weight_bits=4, act_bits=4
    )
    rows.append({
        "format": "w4a4_int8_stored",
        "raw_bytes": tree_bytes(qp4),
        "npz_bytes": npz_bytes(qp4, f"{tmp}/w4.npz"),
    })

    # pack cost (host, one-time at export) — warm once so the number is the
    # codec, not XLA compile
    packed = jax.block_until_ready(pack_qparams_int4(qp4))
    jax.block_until_ready(unpack_qparams_int4(packed))
    t0 = time.perf_counter()
    packed = jax.block_until_ready(pack_qparams_int4(qp4))
    t_pack = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(unpack_qparams_int4(packed))
    t_unpack = time.perf_counter() - t0
    rows.append({
        "format": "w4a4_packed",
        "raw_bytes": tree_bytes(packed),
        "npz_bytes": npz_bytes(packed, f"{tmp}/w4p.npz"),
        "pack_ms": round(t_pack * 1e3, 2),
        "unpack_ms": round(t_unpack * 1e3, 2),
    })

    for r in rows:
        base = rows[0]["raw_bytes"]
        r["vs_f32"] = round(r["raw_bytes"] / base, 4)
        print(json.dumps(r), flush=True)

    # serve-path smoke: packed artifact through engine_from_artifact equals
    # the unpacked forward's logits bit-for-bit (same jit graph modulo the
    # in-graph unpack, which reconstructs identical int8 codes)
    from alignq_tpu.kernels.artifact import save_int8_artifact
    from alignq_tpu.serve import engine_from_artifact

    art = f"{tmp}/art_w4_packed.npz"
    save_int8_artifact(art, packed, meta={
        "model": "resnet20", "act_bits": 4, "weight_bits": 4,
        "act_impl": "bins", "stream": "int16", "packed_int4": 1,
    })
    eng = engine_from_artifact(art, batch_size=8)
    xs = np.random.RandomState(0).randn(8, 32, 32, 3).astype(np.float32)
    got = eng.submit(xs).result()
    eng.close()
    ref = np.asarray(
        jax.jit(
            lambda q, xx: resnet20_int8_forward(q, xx, act_bits=4, act_impl="bins")
        )(qp4, jnp.asarray(xs))
    )
    agree = bool(np.array_equal(got, ref))
    print(json.dumps({
        "serve_packed_artifact": "ok",
        "artifact_bytes": os.path.getsize(art),
        "logits_equal_unpacked": agree,
    }), flush=True)
    assert agree, "packed serve path diverged from the unpacked graph"


if __name__ == "__main__":
    main()
