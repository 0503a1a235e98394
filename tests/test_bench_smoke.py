"""Driver-contract gate for bench.py (the end-of-round benchmark entry).

The driver runs `python bench.py` on real TPU hardware and records its
single JSON stdout line in BENCH_r{N}.json; a crash or malformed output
there loses the round's headline. This test runs the benchmark's CPU
smoke mode (ALIGNQ_BENCH_SMOKE=1 — tiny batch/chains, identical code
path incl. the shape-ceiling + residual-account companions) in a
subprocess and asserts the output contract:

  - exactly ONE stdout line, valid JSON;
  - the required schema keys (metric/value/unit/vs_baseline) plus the
    companion diagnostics bench.py documents;
  - finite, positive throughput.

CPU-smoke timing values are meaningless (and residual_vs_mandatory can
be negative when the 64-batch conv "ceiling" exceeds the e2e under CPU
noise) — only the schema and liveness are asserted.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_contract():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["ALIGNQ_BENCH_SMOKE"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {lines!r}"
    row = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in row, f"missing required key {key}: {row}"
    assert row["unit"] == "images/sec"
    assert row["value"] > 0
    # companion diagnostics the docs/judge read alongside the headline
    for key in (
        "frac_of_achievable", "frac_of_nominal", "conv_ceiling_ms",
        "epilogue_isolated_ms", "residual_vs_mandatory", "batch",
    ):
        assert key in row, f"missing companion key {key}: {row}"
    assert row["batch"] == 64  # smoke batch; the real run pins 2048
