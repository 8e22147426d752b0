"""True multi-process (DCN) test of the training driver.

The reference is strictly single-process pmap (SURVEY.md §2.2); this
framework's --multihost path (jax.distributed + a device mesh spanning
processes, collectives over DCN) was written in round 1 but never executed.
This test actually runs it: two OS processes, each with two virtual CPU XLA
devices, form one 4-device ``dp`` mesh via a local gRPC coordinator and train
a tiny config end-to-end (pretraining + interacting epochs + checkpoint).

Everything that makes multihost subtle is exercised: cross-process array
commits (make_array_from_callback in parallel/mesh.py), replicated parameter
updates staying bitwise in sync, process-0-only logging/checkpointing, and
the to_host allgather on save.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, extra_args=()):
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    common = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--cpu", "--multihost",
        "--coordinator", f"localhost:{port}", "--num_processes", "2",
        "--n", "3", "--dim", "2", "--rs", "10.0", "--Theta", "0.15", "--Emax", "4",
        "--batch", "16", "--acc_steps", "2", "--epoch", "2", "--mc_therm", "1",
        "--mc_steps", "4", "--pre_epoch", "2", "--pre_batch", "32",
        "--sr", "--hutchinson", "--ckpt_every", "2",
        "--folder", str(tmp_path) + "/",
        *extra_args,
    ]
    procs = [
        subprocess.Popen(common + ["--process_id", str(i)], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    return outs


def _checksums(outs):
    sums = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("final params checksum:")]
        assert len(lines) == 1, out[-2000:]
        sums.append(lines[0].split()[-1])
    return sums


def test_two_process_training(tmp_path):
    outs = _run_two_process(tmp_path)

    # process 0 wrote the run artifacts exactly once
    rundirs = [d for d in (tmp_path).iterdir()
               if d.is_dir() and d.name.startswith("n_3_")]
    assert len(rundirs) == 1, outs[0][-2000:]
    data = np.loadtxt(rundirs[0] / "data.txt", ndmin=2)
    assert data.shape[0] == 2, "one row per epoch, written by process 0 only"
    assert np.isfinite(data).all()
    # the 4-device mesh (2 procs x 2 virtual devices) is encoded in the dir name
    assert "ndevices_4" in rundirs[0].name
    assert (rundirs[0] / "epoch_000002.pkl").exists()
    # replicated params ended bitwise-identical on both processes
    sums = _checksums(outs)
    assert sums[0] == sums[1], "replicated params diverged across processes"


def test_two_process_training_host64(tmp_path):
    """host64 SR under multi-process: the host-side f64 LAPACK solve runs on
    every process but only process 0's update is applied (broadcast via
    multihost_utils.broadcast_one_to_all, main.py host64_apply_step) —
    independent LAPACK solves could differ bitwise across heterogeneous
    hosts, so replica consistency is exactly what this test pins."""
    outs = _run_two_process(tmp_path, ("--sr_solver", "host64"))
    sums = _checksums(outs)
    assert sums[0] == sums[1], (
        "replicated params diverged across processes under host64 SR"
    )
    rundirs = [d for d in (tmp_path).iterdir()
               if d.is_dir() and d.name.startswith("n_3_")]
    assert len(rundirs) == 1
    data = np.loadtxt(rundirs[0] / "data.txt", ndmin=2)
    assert data.shape[0] == 2 and np.isfinite(data).all()
