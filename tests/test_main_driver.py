"""End-to-end driver test: main.py as a unit.

Runs the full CLI in-process on a tiny configuration and asserts the pieces
that only integration can check: run-directory naming (the reference's
analysis tooling parses hyperparameters out of it, reference main.py:194-206
+ analysis/utils.py), the data.txt byte format (reference main.py:369-374),
pretrained-model caching, checkpoint cadence and resume continuity.
"""

import os
import re

import numpy as np
import pytest

import main as driver

ARGS = [
    "--cpu", "--n", "5", "--dim", "2", "--rs", "10.0", "--Theta", "0.15",
    "--Emax", "9", "--batch", "32", "--acc_steps", "2", "--mc_therm", "2",
    "--mc_steps", "5", "--sr", "--hutchinson", "--pre_epoch", "2",
    "--pre_batch", "64", "--ckpt_every", "1", "--epoch", "2",
]

TRAIN_LINE = re.compile(
    r"^\s*\d+(  -?\d+\.\d{6}){10}(  -?\d+\.\d{4})\n$"
)
PRETRAIN_LINE = re.compile(r"^\s*\d+(  -?\d+\.\d{6}){6}\n$")


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    folder = str(tmp_path_factory.mktemp("driver")) + "/"
    driver.main(ARGS + ["--folder", folder])
    return folder


def _run_dir(folder):
    dirs = [d for d in os.listdir(folder) if d.startswith("n_5_dim_2")]
    assert len(dirs) == 1, dirs
    return os.path.join(folder, dirs[0])


def test_run_directory_name(run):
    d = os.path.basename(_run_dir(run))
    assert d == (
        "n_5_dim_2_rs_10.0_Theta_0.15_Emax_9_twist_0.250_0.250"
        "_nlayers_2_modelsize_16_nheads_4_nhidden_32"
        "_depth_2_spsize_16_tpsize_16_Gmax_15_kappa_10"
        "_mctherm_2_mcsteps_5_mcstddev_0.10_hutchinson"
        # the test harness provides 8 virtual CPU devices (conftest.py), so
        # the driver builds an 8-way dp mesh — the sharded path, as production
        "_damping_0.00100_maxnorm_0.00100_batch_32_ndevices_8_accsteps_2"
    )


def test_run_directory_parses_back(run):
    from coulombgas_tpu.analysis.utils import parse_filename

    n, dim, rs, T, d, h1, h2, b = parse_filename(os.path.basename(_run_dir(run)) + "/")
    assert (n, dim, rs, T) == (5, 2, 10.0, 0.15)
    assert (d, h1, h2, b) == (2, 16, 16, 32)


def test_data_txt_byte_format(run):
    with open(os.path.join(_run_dir(run), "data.txt")) as f:
        lines = f.readlines()
    assert len(lines) == 2
    for line in lines:
        assert TRAIN_LINE.match(line), repr(line)
    data = np.loadtxt(os.path.join(_run_dir(run), "data.txt"), ndmin=2)
    assert data.shape == (2, 12)
    np.testing.assert_array_equal(data[:, 0], [1, 2])


def test_pretrain_log_and_cache(run):
    pre_dirs = []
    for root, _, files in os.walk(os.path.join(run, "freefermion")):
        if "data.txt" in files:
            pre_dirs.append(root)
    assert len(pre_dirs) == 1
    with open(os.path.join(pre_dirs[0], "data.txt")) as f:
        for line in f.readlines():
            assert PRETRAIN_LINE.match(line), repr(line)
    assert os.path.isfile(os.path.join(pre_dirs[0], "params_van.pkl"))


def test_checkpoints_written(run):
    d = _run_dir(run)
    assert os.path.isfile(os.path.join(d, "epoch_000001.pkl"))
    assert os.path.isfile(os.path.join(d, "epoch_000002.pkl"))
    from coulombgas_tpu.io.checkpoint import load_data

    ckpt = load_data(os.path.join(d, "epoch_000002.pkl"))
    assert set(ckpt) == {"key", "x", "params_van", "params_flow", "opt_state"}
    assert ckpt["x"].shape == (32, 5, 2)


def test_resume_appends(run):
    driver.main(ARGS + ["--folder", run, "--epoch", "4", "--epoch_finished", "2"])
    data = np.loadtxt(os.path.join(_run_dir(run), "data.txt"), ndmin=2)
    np.testing.assert_array_equal(data[:, 0], [1, 2, 3, 4])
    # resumed epochs are continuations, not re-inits: observables same scale
    assert abs(data[3, 1] - data[1, 1]) < 10 * (data[1, 2] + data[3, 2]) + 0.5


def test_resume_batch_mismatch_rejected(run):
    # doctor a checkpoint with the wrong walker batch into the run dir
    # (batch is part of the dir name, so this can only happen by corruption —
    # exactly what the load-time validation is for)
    from coulombgas_tpu.io.checkpoint import load_data, save_data

    d = _run_dir(run)
    ckpt = load_data(os.path.join(d, "epoch_000002.pkl"))
    ckpt["x"] = ckpt["x"][:16]
    save_data(ckpt, os.path.join(d, "epoch_000099.pkl"))
    with pytest.raises(ValueError, match="walker batch"):
        driver.main(ARGS + ["--folder", run, "--epoch", "100",
                            "--epoch_finished", "99"])


def test_host64_fisher_refresh_wiring(tmp_path):
    """--sr_solver host64 --fisher_refresh K: the stale-Fisher path must run
    end-to-end through the driver (refresh on epoch 1, cached solves on the
    others) and produce the standard log format with live SR diagnostics."""
    folder = str(tmp_path) + "/"
    driver.main(ARGS + ["--folder", folder, "--epoch", "3",
                        "--sr_solver", "host64", "--fisher_refresh", "2"])
    d = _run_dir(folder)
    data = np.loadtxt(os.path.join(d, "data.txt"), ndmin=2)
    assert data.shape == (3, 12)
    assert np.isfinite(data).all()
    diag = np.loadtxt(os.path.join(d, "sr_diag.txt"), ndmin=2)
    # all three epochs solved (gnorm finite, scale in (0, 1]) — epochs 2-3
    # ran against the cached factorization (refresh schedule 1, 3 with K=2)
    assert diag.shape[0] == 3
    assert np.isfinite(diag).all()
    assert (diag[:, 2] > 0).all() and (diag[:, 4] > 0).all()
