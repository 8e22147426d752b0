"""Analysis utilities: EWM statistics, filename parsing, sweep summary, cluster scripts."""

import numpy as np

from coulombgas_tpu.analysis.ewm import running_average
from coulombgas_tpu.analysis.utils import natural_sort, parse_filename


def test_running_average_closed_form():
    """EWM with adjust=False, bias=True equals the explicit weighted sums."""
    rng = np.random.default_rng(0)
    n, alpha = 10, 0.1
    data = rng.normal(size=n + 1)
    weight = np.concatenate([[(1 - alpha) ** n], alpha * (1 - alpha) ** np.arange(n)[::-1]])
    assert np.isclose(weight.sum(), 1.0)

    mean, var = running_average(data, alpha)
    expected_mean = (weight * data).sum()
    expected_var = (weight * (data - expected_mean) ** 2).sum()
    assert np.isclose(mean[-1], expected_mean)
    assert np.isclose(var[-1], expected_var)


def test_parse_filename():
    f = ("n_49_dim_2_rs_1.0_Theta_0.15_Emax_36_twist_0.250_0.250_nlayers_2_"
         "modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_tpsize_16_Gmax_15_"
         "kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_hutchinson_"
         "damping_0.00100_maxnorm_0.00100_batch_512_ndevices_8_accsteps_16")
    n, dim, rs, T, d, h1, h2, b = parse_filename(f)
    assert (n, dim, rs, T, d, h1, h2, b) == (49, 2, 1.0, 0.15, 2, 16, 16, 512)


def test_natural_sort():
    assert natural_sort(["x10", "x2", "x1"]) == ["x1", "x2", "x10"]


def test_sweep_summary(tmp_path):
    from coulombgas_tpu.analysis.plot import sweep_summary

    run = tmp_path / ("n_5_dim_2_rs_2.0_Theta_0.15_Emax_4_twist_0.250_0.250_"
                      "nlayers_2_modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_"
                      "tpsize_16_Gmax_15_kappa_10_mctherm_1_mcsteps_3_mcstddev_0.10_"
                      "lr_0.001_batch_16_ndevices_1_accsteps_2")
    run.mkdir()
    rows = np.array([[i + 1, 1.0, 0.1, 2.0, 0.1, 3.0, 0.1, -1.0, 0.1, 4.0, 0.1, 0.5]
                     for i in range(20)])
    np.savetxt(run / "data.txt", rows)
    out = sweep_summary(str(tmp_path))
    assert len(out) == 1
    assert out[0]["n"] == 5 and abs(out[0]["F"] - 1.0) < 1e-9


def test_cluster_scripts():
    from coulombgas_tpu.cluster.submit import production_args, slurm_script, tpu_pod_script

    prog = "main.py " + production_args(n=57, Emax=49)
    s = slurm_script(prog, "a100", 8, "n57")
    assert "#SBATCH --gres=gpu:8" in s and "--n 57" in s and "--hutchinson" in s
    t = tpu_pod_script(prog, "v5p-8", "n57")
    assert "tpu-vm ssh" in t
