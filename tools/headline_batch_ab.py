"""Same-process batch-size sweep of the headline bench graph (fast stack).

Times the exact bench.py path (resnet20_int8_forward, act_impl='poly',
stream='int8') at batches 1024, 2048, and 4096 with the chained value-fetch
protocol — imported from tools/honest_timing.py, the SAME implementation
bench.py uses — to pick the headline batch (currently 2048). Same process,
so the rows are comparable; run on the real chip (ambient axon env).

Usage: timeout 2400 python tools/headline_batch_ab.py
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import resnet20_analytic_flops  # noqa: E402
from alignq_tpu.kernels import infer as qinfer  # noqa: E402
from tools.honest_timing import headline_measure  # noqa: E402


def measure(batch: int, n1: int = 8, n2: int = 40, reps: int = 3) -> float:
    _, (qparams, x) = qinfer.build_resnet20_int8(batch)

    def fwd(qargs, x):
        return qinfer.resnet20_int8_forward(
            qargs, x, act_impl="poly", stream="int8"
        )

    return headline_measure(fwd, qparams, x, n1=n1, n2=n2, reps=reps)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    bs = ap.parse_args().batches
    for batch in bs:
        dt = measure(batch)
        tops = resnet20_analytic_flops(batch) / dt / 1e12
        print(
            json.dumps(
                {
                    "batch": batch,
                    "ms_per_fwd": round(dt * 1e3, 3),
                    "img_per_sec": round(batch / dt, 1),
                    "analytic_tops": round(tops, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
