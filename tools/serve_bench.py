"""Serving-engine latency/throughput under honest (host-visible) timing.

`BatchedInferenceEngine.submit(...).result()` hands back a NumPy array, so
timing submit->result is valid by construction on this backend (unlike
block_until_ready timing — bench.py methodology note). What it measures is
the full user-visible path: host batching + H2D transfer + device compute +
D2H fetch. Through this build's remote-TPU tunnel the transfer legs dominate
(~6 MB/s relay); the `xfer_mbps` row quantifies that ceiling so the engine
overhead can be read relative to it.

Rows (one JSON line each):
  xfer_mbps        raw H2D+fetch bandwidth of one batch tensor (no engine)
  lat_bN           median submit->result latency at request size N
                   (engine batch 256; N<256 exercises the padding path)
  stream_b256      throughput over 16 back-to-back full-batch requests
                   submitted before any result is read (pipelining)

    timeout 3000 python tools/serve_bench.py    # ambient env -> real TPU
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine_batch", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    a = ap.parse_args()

    from alignq_tpu.models import resnet20_quant
    from alignq_tpu.serve import build_int8_resnet20_engine

    model = resnet20_quant(bitW=8, abitW=8, method="ours")
    import jax.numpy as jnp

    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x0, train=False)

    # raw transfer bandwidth of one engine batch (upload + value fetch)
    xb = np.random.RandomState(0).rand(a.engine_batch, 32, 32, 3).astype(np.float32)
    for _ in range(2):  # settle
        _ = np.asarray(jnp.asarray(xb))
    t0 = time.perf_counter()
    _ = np.asarray(jnp.asarray(xb) + 1.0)
    dt_x = time.perf_counter() - t0
    print(json.dumps({
        "name": "xfer_mbps", "value": round(xb.nbytes * 2 / dt_x / 1e6, 1),
        "batch_bytes": xb.nbytes,
    }), flush=True)

    engine = build_int8_resnet20_engine(
        variables["params"], variables["batch_stats"], batch_size=a.engine_batch
    )
    try:
        # warm the full request path once
        engine.submit(xb).result()

        for n in (1, 64, a.engine_batch):
            lats = []
            for _ in range(a.reps):
                req = xb[:n]
                t0 = time.perf_counter()
                out = engine.submit(req).result()
                lats.append(time.perf_counter() - t0)
                assert out.shape == (n, 10)
            print(json.dumps({
                "name": f"lat_b{n}",
                "median_ms": round(sorted(lats)[len(lats) // 2] * 1e3, 2),
                "min_ms": round(min(lats) * 1e3, 2),
            }), flush=True)

        # streaming: submit 16 full batches, then drain
        nreq = 16
        t0 = time.perf_counter()
        futs = [engine.submit(xb) for _ in range(nreq)]
        for f in futs:
            f.result(timeout=600)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "name": "stream_b256",
            "imgs_per_sec": round(nreq * a.engine_batch / dt, 1),
            "total_s": round(dt, 3),
        }), flush=True)
    finally:
        engine.close()


if __name__ == "__main__":
    main()
