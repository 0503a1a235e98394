"""Trajectory parity against the ACTUAL reference code (VERDICT.md round-2
item 1): tools/reference_parity.py imports the canonical admm56 project's own
model/quantizer/optimizer modules, runs its own train() on a synthetic
loader, and compares weight + dual trajectories against the production train
step — in both the committed-semantics and intended-semantics modes (see the
tool's docstring for the full patch inventory).

Runs in a subprocess: the reference's argparse singleton parses sys.argv at
import (utils/options.py), and its top-level `model`/`utils`/`data` packages
must not leak into this test process's module namespace.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_reference_code_trajectory_parity():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_parity.py",
         "--steps", "5"],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 3, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    for rec in (json.loads(ln) for ln in lines[:2]):
        assert rec["pass"], rec
        assert rec["dual_sites"] == 21
    assert json.loads(lines[-1])["pass"]
    assert r.returncode == 0
