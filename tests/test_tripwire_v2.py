"""Tripwire v2 replay tests against the REAL run traces.

Three failure archives drive these assertions:

* data/failed_r5_chol_extension/ — the chol-solver entropy leak (S 4.49 ->
  3.87 at flat F): the new entropy-drift alarm must fire on the replay and
  stay silent on every committed healthy trace;
* data/failed_r5_host64_divergence/ — the host64 catastrophic-step cascade
  (poisoned walkers, exploded stderr): the sigma-explosion/accept-collapse
  guards must trip within 2 epochs where v1 logged 17 garbage epochs;
* the committed healthy logs — zero false reverts and zero drift alarms
  when replayed end to end.
"""

import os

import numpy as np
import pytest

from coulombgas_tpu.train.tripwire import UpdateTripwire

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
RS10 = os.path.join(
    DATA, "interacting",
    "n_29_dim_2_rs_10.0_Theta_0.15_Emax_25_twist_0.250_0.250_nlayers_2_"
    "modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_tpsize_16_Gmax_15_"
    "kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_hutchinson_"
    "damping_0.00100_maxnorm_0.00100_batch_2048_ndevices_1_accsteps_4",
    "data.txt")


def _replay(rows, tw=None):
    """Feed data.txt-format rows (iter F F_std ... S S_std accept) through a
    production-configured tripwire; returns (tripwire, revert_epochs)."""
    tw = tw or UpdateTripwire(sigma=6.0)
    reverts = []
    for i, r in enumerate(rows):
        tw.snapshot(("state", i))
        out = tw.check(float(r[1]), float(r[2]), bool(np.isfinite(r).all()),
                       accept=float(r[11]), S=float(r[9]))
        if out is not None:
            reverts.append(int(r[0]))
    return tw, reverts


def test_drift_alarm_fires_on_chol_leak_extension():
    healthy = np.loadtxt(RS10, ndmin=2)
    ext = np.loadtxt(os.path.join(DATA, "failed_r5_chol_extension",
                                  "data_ext_3001_3600.txt"), ndmin=2)
    tw, _ = _replay(np.concatenate([healthy, ext]))
    assert tw.drift_events, "entropy-drift alarm never fired on the chol leak"
    first = tw.drift_events[0]
    assert first > len(healthy), (
        "drift alarm fired inside the HEALTHY 3000-epoch trace (epoch %d)"
        % first)
    assert first <= len(healthy) + 450, (
        "drift alarm too late: fired %d epochs into the 600-epoch leak"
        % (first - len(healthy)))


@pytest.mark.parametrize("rel", [
    "interacting/n_29_dim_2_rs_10.0_Theta_0.15_Emax_25_twist_0.250_0.250_"
    "nlayers_2_modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_tpsize_16_"
    "Gmax_15_kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_hutchinson_"
    "damping_0.00100_maxnorm_0.00100_batch_2048_ndevices_1_accsteps_4/data.txt",
    "interacting/n_29_dim_2_rs_1.0_Theta_0.15_Emax_25_twist_0.250_0.250_"
    "nlayers_2_modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_tpsize_16_"
    "Gmax_15_kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_hutchinson_"
    "damping_0.00100_maxnorm_0.00100_batch_2048_ndevices_1_accsteps_4/data.txt",
    "interacting/n_57_dim_2_rs_1.0_Theta_0.15_Emax_49_twist_0.250_0.250_"
    "nlayers_2_modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_tpsize_16_"
    "Gmax_15_kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_hutchinson_"
    "damping_0.00100_maxnorm_0.00100_batch_512_ndevices_1_accsteps_16/data.txt",
], ids=["rs10", "rs1", "n57"])
def test_healthy_traces_stay_silent(rel):
    rows = np.loadtxt(os.path.join(DATA, rel), ndmin=2)
    tw, reverts = _replay(rows)
    assert tw.drift_events == [], (
        "false entropy-drift alarm on a healthy trace: %s" % tw.drift_events)
    # A replay is NOT the live run: live reverted-and-reran epochs never
    # reach data.txt, so the replayed history differs from the history the
    # live tripwire saw, and the PRE-EXISTING jump detector may legitimately
    # fire on real F excursions the live run handled (e.g. the rs=10 trace
    # carries +0.02 one-epoch moves around its 8 live events).  The v2
    # contract is therefore differential: the NEW signal guards (stderr
    # explosion / accept collapse) must add ZERO reverts beyond what the
    # F-only detectors produce on the identical rows.
    f_only = []
    tw0 = UpdateTripwire(sigma=6.0)
    for i, r in enumerate(rows):
        tw0.snapshot(("state", i))
        if tw0.check(float(r[1]), float(r[2]),
                     bool(np.isfinite(r).all())) is not None:
            f_only.append(int(r[0]))
    assert reverts == f_only, (
        "signal guards added reverts on a healthy trace: %s vs F-only %s"
        % (reverts, f_only))


def test_sigma_explosion_and_accept_collapse_trip_fast():
    """Replay the host64 divergence: v1 logged 17 poisoned epochs (F_std 98,
    accept 0.03) without firing; v2 must revert within 2 epochs of the first
    poisoned epoch (3028) and keep reverting rather than logging garbage."""
    healthy = np.loadtxt(RS10, ndmin=2)[-600:]
    trace = np.loadtxt(os.path.join(DATA, "failed_r5_host64_divergence",
                                    "trace_3001_3052.txt"), ndmin=2)
    tw, reverts = _replay(np.concatenate([healthy, trace]))
    poisoned = [int(r[0]) for r in trace if r[2] > 0.01]  # exploded stderr
    assert poisoned[0] == 3028
    fired = [e for e in reverts if e >= 3022]
    assert fired, "no revert fired on the divergence trace"
    assert min(e for e in fired if e >= 3028) <= 3029, (
        "first poisoned epoch not caught within 2 epochs: %s" % fired)


def test_synthetic_sigma_explosion_trips():
    tw = UpdateTripwire(sigma=6.0)
    for i in range(30):
        tw.snapshot(i)
        assert tw.check(-4.9 + 0.001 * np.sin(i), 0.0012, True,
                        accept=0.41, S=4.4) is None
    tw.snapshot("bad")
    # F only mildly off, but stderr exploded 5 orders of magnitude
    assert tw.check(-4.0, 98.0, True, accept=0.40, S=4.4) is not None


def test_synthetic_accept_collapse_trips():
    tw = UpdateTripwire(sigma=6.0)
    for i in range(30):
        tw.snapshot(i)
        assert tw.check(-4.9 + 0.001 * np.sin(i), 0.0012, True,
                        accept=0.41, S=4.4) is None
    tw.snapshot("bad")
    assert tw.check(-4.9, 0.0012, True, accept=0.03, S=4.4) is not None


def test_legacy_positional_api_still_works():
    tw = UpdateTripwire(sigma=10.0)
    tw.snapshot("a")
    assert tw.check(-1.0, 0.01, True) is None
    tw.snapshot("b")
    assert tw.check(float("nan"), float("nan"), False) == "a"
