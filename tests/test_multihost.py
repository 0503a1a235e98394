"""Multi-host execution layer (dist/multihost.py; VERDICT r3 missing #2).

These tests run REAL 2-process training: two localhost CPU processes join a
jax.distributed rendezvous (gloo cross-process collectives), each feeds its
per-process batch shard through `jax.make_array_from_process_local_data`,
and the gather-mode GSPMD step trains over the global 2-device mesh. The
loss trajectory must equal a single-process run over the same 2-device
mesh (virtual devices) — same program and partitioning, only the transport
differs.

The reference has no distributed layer at all (SURVEY.md section 2.1:
no torch.distributed import anywhere); this is the framework's own
scaling story (SURVEY.md section 7 item 7, BASELINE.json 2-host north
star) tested at the collective boundary and beyond.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
job_dir = sys.argv[4]; admm = sys.argv[5] == "1"
if n > 1:
    from alignq_tpu.dist import multihost
    multihost.initialize(f"127.0.0.1:{port}", n, pid)
import jax
from alignq_tpu.data.registry import get_data
from alignq_tpu.train.config import TrainConfig
from alignq_tpu.train.loop import fit

cfg = TrainConfig(
    target_model="resnet20_quant", dataset="synthetic", num_epochs=1,
    train_batch_size=32, eval_batch_size=64, lr=0.01, admm=admm,
    mesh_shape=(2,), mesh_axes=("data",), corr_mode="gather",
    job_dir=job_dir, print_freq=1, seed=7,
)
data = get_data(cfg.dataset, "/tmp", cfg.train_batch_size,
                cfg.eval_batch_size, cfg.seed)
res = fit(cfg, data, max_steps=4)
print("RESULT " + json.dumps({
    "best_top1": res["best_top1"], "proc": jax.process_index(),
    "nproc": jax.process_count(),
}), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_devices=1):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    return env


def _run_worker(pid, n, port, job_dir, admm, n_devices=1):
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, str(pid), str(n), str(port),
         job_dir, "1" if admm else "0"],
        env=_env(n_devices), stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True,
    )


def _result_line(out):
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError(f"no RESULT line in:\n{out}")


def _losses(job_dir):
    path = os.path.join(job_dir, "run", "train.jsonl")
    with open(path) as f:
        return [json.loads(line)["loss"] for line in f]


def _run_pair(tmp_path, admm):
    port = _free_port()
    # ONE shared job_dir: orbax checkpointing is a collective (each process
    # writes its addressable shards, process 0 the metadata) and requires a
    # shared filesystem path; per-process logger files / primary-only metric
    # writers already disambiguate inside it (train/loop.py fit)
    d0 = str(tmp_path / "mh")
    p0 = _run_worker(0, 2, port, d0, admm)
    p1 = _run_worker(1, 2, port, d0, admm)
    out0, err0 = p0.communicate(timeout=900)
    out1, err1 = p1.communicate(timeout=900)
    assert p0.returncode == 0, f"proc0 failed:\n{out0}\n{err0}"
    assert p1.returncode == 0, f"proc1 failed:\n{out1}\n{err1}"
    r0, r1 = _result_line(out0), _result_line(out1)
    assert r0["nproc"] == 2 and r1["nproc"] == 2
    return d0, r0, r1


@pytest.mark.slow
class TestTwoProcessFit:
    def test_two_process_matches_single_process(self, tmp_path):
        """2-process gather-mode DP fit == 1-process 2-virtual-device fit,
        step for step (losses to fp tolerance) and in eval top1."""
        d0, r0, r1 = _run_pair(tmp_path, admm=False)

        ds = str(tmp_path / "single")
        ps = _run_worker(0, 1, "0", ds, admm=False, n_devices=2)
        outs, errs = ps.communicate(timeout=900)
        assert ps.returncode == 0, f"single-proc failed:\n{outs}\n{errs}"
        rs = _result_line(outs)

        # primary-host metric stream exists on proc 0's job dir only
        losses_mh = _losses(d0)
        losses_sp = _losses(ds)
        assert len(losses_mh) == len(losses_sp) == 4
        np.testing.assert_allclose(losses_mh, losses_sp, rtol=2e-4, atol=2e-4)
        assert r0["best_top1"] == pytest.approx(rs["best_top1"], abs=0.5)
        # both processes report the same (replicated) eval metric
        assert r0["best_top1"] == pytest.approx(r1["best_top1"], abs=1e-6)

    def test_two_process_admm_gather_corr(self, tmp_path):
        """ADMM gather mode across processes: the global-batch corr matrices
        all-gather over the cross-process transport; losses stay finite and
        identical on both hosts (replicated metrics)."""
        d0, r0, r1 = _run_pair(tmp_path, admm=True)
        losses = _losses(d0)
        assert len(losses) == 4 and all(np.isfinite(losses))
        assert r0["best_top1"] == pytest.approx(r1["best_top1"], abs=1e-6)


class TestHelpers:
    def test_local_batch_slice_rows(self):
        import jax.numpy as jnp

        from alignq_tpu.dist import multihost

        batch = (jnp.arange(8).reshape(8, 1), jnp.arange(8))
        x0, y0 = multihost.local_batch_slice(batch, num_processes=2, process_id=0)
        x1, y1 = multihost.local_batch_slice(batch, num_processes=2, process_id=1)
        np.testing.assert_array_equal(np.asarray(y0), [0, 1, 2, 3])
        np.testing.assert_array_equal(np.asarray(y1), [4, 5, 6, 7])
        with pytest.raises(ValueError):
            multihost.local_batch_slice(
                (jnp.arange(7),), num_processes=2, process_id=0
            )

    def test_single_process_fit_unaffected(self):
        """multihost.active() is False here, so fit()'s placement path is
        the plain shard_batch one (covered by test_train_dist); just check
        the predicates."""
        from alignq_tpu.dist import multihost

        assert not multihost.active()
        assert multihost.is_primary()
