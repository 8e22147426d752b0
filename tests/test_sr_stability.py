"""Round-2 stability machinery: trust-region guard, host-f64 solves, tripwire.

Forensics of the round-1 n=29 interacting collapse (PARITY.md) traced the
entropy crash to discrete catastrophic f32 SR steps taken through the
``gnorm <= 0`` path of the trust-region scaling — these tests pin the fixed
semantics (garbage curvature => NULL step, never an unscaled step), the
host-f64 apply path, the MCMC stuck-walker rescue, and the driver tripwire.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coulombgas_tpu.optim.host_sr import host_hybrid_apply, host_solve_scaled, ravel_host
from coulombgas_tpu.optim.sr import _solve_scaled, hybrid_fisher_sr
from coulombgas_tpu.sampling.mcmc import mcmc
from coulombgas_tpu.train.tripwire import UpdateTripwire


def test_solve_scaled_negative_curvature_zero_step():
    """gnorm <= 0 (indefinite f32 solve) must produce a NULL step.

    Round 1 clamped the trust-region denominator to ``tiny`` instead, which
    sent scale -> 1 and applied the garbage step UNSCALED — the mechanism
    behind the n=29 epoch-412 catastrophe (PARITY.md round 2).
    """
    P = 8
    # negative-definite "Fisher": g^T M^-1 g < 0 for damping < 1
    fisher = -jnp.eye(P, dtype=jnp.float32)
    g = jnp.ones((P,), jnp.float32)
    upd = _solve_scaled(fisher, g, damping=1e-3, max_norm=1e-3)
    np.testing.assert_array_equal(np.asarray(upd), np.zeros(P, np.float32))

    upd, diag = _solve_scaled(fisher, g, damping=1e-3, max_norm=1e-3, with_diag=True)
    assert float(diag["gnorm"]) < 0
    assert float(diag["scale"]) == 0.0


def test_solve_scaled_positive_curvature_unchanged():
    """Healthy solves keep the reference trust-region semantics exactly."""
    P = 16
    key = jax.random.PRNGKey(0)
    S = jax.random.normal(key, (64, P), jnp.float64)
    fisher = S.T @ S / 64
    g = jax.random.normal(jax.random.PRNGKey(1), (P,), jnp.float64)
    upd = _solve_scaled(fisher, g, damping=1e-3, max_norm=1e-3)
    M = fisher + 1e-3 * jnp.eye(P)
    raw = jnp.linalg.solve(M, g)
    gnorm = float(g @ raw)
    scale = min(np.sqrt(1e-3 / gnorm), 1.0)
    np.testing.assert_allclose(np.asarray(upd), np.asarray(-scale * raw), rtol=1e-10)


def test_host_solve_matches_device_f64():
    """host_solve_scaled == _solve_scaled on the same f64 problem."""
    P = 24
    key = jax.random.PRNGKey(2)
    S = jax.random.normal(key, (96, P), jnp.float64)
    fisher = S.T @ S / 96
    g = jax.random.normal(jax.random.PRNGKey(3), (P,), jnp.float64)
    upd_dev = _solve_scaled(fisher, g, damping=1e-3, max_norm=1e-3)
    upd_host, diag = host_solve_scaled(np.asarray(fisher), np.asarray(g), 1e-3, 1e-3)
    np.testing.assert_allclose(upd_host, np.asarray(upd_dev), rtol=1e-9)
    assert diag["gnorm"] > 0

    # negative curvature -> null step, same as the device guard
    upd_host, diag = host_solve_scaled(-np.eye(P), np.ones(P), 1e-3, 1e-3)
    np.testing.assert_array_equal(upd_host, np.zeros(P))
    assert diag["scale"] == 0.0


def test_host_hybrid_apply_matches_device_apply():
    """Full host-f64 apply == the jitted device apply path (f64 CPU).

    Builds a synthetic accumulator pytree exactly as train.accumulate would
    and runs both apply paths on it.
    """
    import optax
    from jax.flatten_util import ravel_pytree

    from coulombgas_tpu.train.train import make_accumulate_and_apply

    Pv, Pf = 5, 4
    acc_steps = 3
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 12)
    params_van = {"a": jax.random.normal(ks[0], (Pv,), jnp.float64)}
    params_flow = {"b": jax.random.normal(ks[1], (Pf,), jnp.float64)}

    Sc = jax.random.normal(ks[2], (32, Pv), jnp.float64)
    Sq = jax.random.normal(ks[3], (32, Pf), jnp.float64)
    data = {k: jax.random.normal(ks[4 + i], ()) ** 2
            for i, k in enumerate(["F_mean", "F2_mean", "E_mean", "E2_mean",
                                   "K_mean", "K2_mean", "V_mean", "V2_mean"])}
    data["S_mean"] = jnp.asarray(1.0, jnp.float64)
    data["S2_mean"] = jnp.asarray(2.0, jnp.float64)
    acc = {
        "data": data,
        "grads": ({"a": jax.random.normal(ks[8], (Pv,), jnp.float64)},
                  {"b": jax.random.normal(ks[9], (Pf,), jnp.float64)}),
        "classical_score": {"a": jax.random.normal(ks[10], (Pv,), jnp.float64)},
        "quantum_score": {"b": jax.random.normal(ks[11], (Pf,), jnp.float64)},
        "classical_fisher": Sc.T @ Sc / 32,
        "quantum_fisher": Sq.T @ Sq / 32,
        "quantum_score_mean": jnp.stack([Sq.mean(0), 0.1 * Sq.mean(0)]),
    }

    sr_opt = hybrid_fisher_sr(None, None, 1e-3, 1e-3)
    _, apply_update = make_accumulate_and_apply(None, None, acc_steps, sr_opt)
    pv_dev, pf_dev, _, data_dev = apply_update(params_van, params_flow,
                                               sr_opt.init(None), acc)

    acc_host = jax.device_get(acc)
    uv, uf, data_host, diag = host_hybrid_apply(acc_host, acc_steps, 1e-3, 1e-3)
    _, unravel_van = ravel_pytree(params_van)
    _, unravel_flow = ravel_pytree(params_flow)
    pv_host = optax.apply_updates(params_van, unravel_van(jnp.asarray(uv)))
    pf_host = optax.apply_updates(params_flow, unravel_flow(jnp.asarray(uf)))

    np.testing.assert_allclose(np.asarray(pv_host["a"]), np.asarray(pv_dev["a"]), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(pf_host["b"]), np.asarray(pf_dev["b"]), rtol=1e-9)
    for k in data:
        np.testing.assert_allclose(data_host[k], float(data_dev[k]), rtol=1e-12)
    assert diag["scale_van"] > 0 and diag["scale_flow"] > 0


def test_sym_pack_roundtrip_and_packed_apply():
    """sym_pack/sym_unpack are a bitwise round-trip on symmetric matrices,
    and host_hybrid_apply on a packed accumulator matches the dense one.

    The production host64 path (main.py pack_acc_jit, pretrain
    grads_and_fisher) ships the Fisher matrices as packed upper triangles to
    halve the device->host transfer; this pins that the packing changes no
    numerics at all."""
    from coulombgas_tpu.optim.host_sr import sym_pack, sym_unpack

    key = jax.random.PRNGKey(7)
    S = jax.random.normal(key, (32, 9), jnp.float64)
    # XLA's S.T @ S is not bitwise symmetric (ij and ji reductions may order
    # differently, ~1 ulp apart) — symmetrize, as sym_unpack's output is by
    # construction; the solver only ever reads the upper triangle.
    M = np.asarray(S.T @ S / 32)
    M = np.triu(M) + np.triu(M, 1).T
    np.testing.assert_array_equal(sym_unpack(np.asarray(sym_pack(jnp.asarray(M)))), M)

    Pv, Pf = 5, 4
    ks = jax.random.split(key, 8)
    Sc = jax.random.normal(ks[0], (32, Pv), jnp.float64)
    Sq = jax.random.normal(ks[1], (32, Pf), jnp.float64)
    data = {"F_mean": jnp.asarray(1.0), "E_mean": jnp.asarray(2.0)}
    acc = {
        "data": data,
        "grads": ({"a": jax.random.normal(ks[2], (Pv,), jnp.float64)},
                  {"b": jax.random.normal(ks[3], (Pf,), jnp.float64)}),
        "classical_score": {"a": jax.random.normal(ks[4], (Pv,), jnp.float64)},
        "quantum_score": {"b": jax.random.normal(ks[5], (Pf,), jnp.float64)},
        "classical_fisher": Sc.T @ Sc / 32,
        "quantum_fisher": Sq.T @ Sq / 32,
        "quantum_score_mean": jnp.stack([Sq.mean(0), 0.1 * Sq.mean(0)]),
    }
    dense = jax.device_get(acc)
    packed = jax.device_get(dict(
        acc,
        classical_fisher=sym_pack(acc["classical_fisher"]),
        quantum_fisher=sym_pack(acc["quantum_fisher"]),
    ))
    uv_d, uf_d, _, diag_d = host_hybrid_apply(dense, 2, 1e-3, 1e-3)
    uv_p, uf_p, _, diag_p = host_hybrid_apply(packed, 2, 1e-3, 1e-3)
    np.testing.assert_array_equal(uv_p, uv_d)
    np.testing.assert_array_equal(uf_p, uf_d)
    assert diag_p == diag_d


def test_ravel_host_matches_ravel_pytree():
    from jax.flatten_util import ravel_pytree

    tree = {"b": np.arange(3.0), "a": {"c": np.ones((2, 2)), "d": 5.0}}
    np.testing.assert_array_equal(ravel_host(tree), np.asarray(ravel_pytree(tree)[0]))


def test_mcmc_stuck_walker_rescue():
    """Walkers whose current logp is non-finite must escape via any finite proposal."""

    def logp_fn(x):
        # finite only in the right half-plane
        s = x.sum(axis=(-2, -1))
        return jnp.where(s > 0, -0.5 * s**2, jnp.nan)

    x0 = -jnp.ones((16, 2, 1), jnp.float64)  # all stuck: logp(x0) = NaN
    x, _ = mcmc(logp_fn, x0, jax.random.PRNGKey(0), mc_steps=200, mc_stddev=1.0)
    assert np.all(np.isfinite(np.asarray(logp_fn(x))))


def test_pretrain_host64_matches_plain_in_f64():
    """On CPU f64 the host64 pretrain path reproduces the device solve."""
    from coulombgas_tpu.models.transformer import TransformerConfig, init_transformer_params
    from coulombgas_tpu.train.pretrain import pretrain

    n, dim, Theta, Emax = 3, 2, 0.15, 4
    from coulombgas_tpu.physics.orbitals import sp_orbitals

    _, Es = sp_orbitals(dim, Emax)
    cfg = TransformerConfig(Es.size, 1, 8, 2, 8)
    key = jax.random.PRNGKey(0)
    params0 = init_transformer_params(key, cfg, dim, jnp.float64)

    outs = {}
    for solver in ("plain", "host64"):
        outs[solver] = pretrain(
            cfg, params0, n, dim, Theta, Emax, [0.25, 0.25],
            "/tmp/pretrain_host64_%s" % solver, key,
            lr=1e-3, sr=True, damping=1e-3, max_norm=1e-3,
            batch=64, epoch=3, check_analytic=False, log_every=10,
            solver=solver,
        )
    a = np.asarray(jax.flatten_util.ravel_pytree(jax.device_get(outs["plain"]))[0])
    b = np.asarray(jax.flatten_util.ravel_pytree(jax.device_get(outs["host64"]))[0])
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-9)


def test_tripwire_reverts_on_jump_and_nan():
    tw = UpdateTripwire(sigma=10.0, cooldown=2)
    # healthy epochs (>= 7 deltas so the scatter estimate arms the detector)
    best = None
    for i in range(8):
        F = -4.90 - 0.002 * i
        tw.snapshot("p%d" % i)
        assert tw.check(F, 0.01, True) is None
        best = "p%d" % i  # descending: every epoch is the new best
    # catastrophic upward jump: revert to the best healthy parameters
    tw.snapshot("pbad")
    assert tw.check(-3.00, 0.01, True) == best
    # cooldown: the recovery epoch must not re-trigger
    tw.snapshot("p1b")
    assert tw.check(-4.0, 0.01, True) is None
    tw.snapshot("p2b")
    assert tw.check(-4.8, 0.01, True) is None

    # NaN observables revert even before the detector arms (no scatter yet)
    tw2 = UpdateTripwire(sigma=10.0)
    tw2.snapshot("a")
    tw2.check(-1.0, 0.01, True)
    tw2.snapshot("b")
    tw2.check(-1.0, 0.01, True)
    tw2.snapshot("c")
    assert tw2.check(float("nan"), float("nan"), False) == "b"


def test_tripwire_downward_jump_ok():
    """Fast descent (training progress) must never trigger."""
    tw = UpdateTripwire(sigma=10.0)
    F = -1.0
    for i in range(50):
        tw.snapshot(i)
        assert tw.check(F, 0.001, True) is None
        F -= 0.5  # steep but downward


def test_tripwire_shrinks_trust_region_on_persistent_instability():
    """An event burst must shrink trust_scale, never remove protection.

    (The round-2 n=49 run showed disable-on-burst lets the next unguarded
    catastrophic step collapse the run.)"""
    tw = UpdateTripwire(sigma=5.0, cooldown=0, burst_events=3, window=100)
    # establish a healthy baseline first (arms the scatter-based detector)
    for i in range(8):
        tw.snapshot(("h", i))
        assert tw.check(-1.0 - 0.01 * i, 0.01, True) is None
    F_bad = 10.0
    fired = 0
    for i in range(12):
        tw.snapshot(("b", i))
        if tw.check(F_bad, 0.01, True) is not None:
            fired += 1
    assert fired == 12  # every bad epoch still reverts — no disable
    assert not tw.disabled
    assert tw.trust_scale < 1.0  # escalation kicked in
    assert tw.trust_scale >= tw.min_trust_scale


def test_tripwire_trust_scale_relaxes_after_healthy_window():
    tw = UpdateTripwire(sigma=5.0, cooldown=0, burst_events=2, window=10)
    for i in range(8):  # healthy baseline arms the detector
        tw.snapshot(("h", i))
        tw.check(-1.0 - 0.01 * i, 0.01, True)
    for i in range(3):  # burst -> shrink
        tw.snapshot(("b", i))
        tw.check(5.0, 0.01, True)
    shrunk = tw.trust_scale
    assert shrunk < 1.0
    for i in range(40):  # long healthy stretch -> relax back toward 1
        tw.snapshot(("h2", i))
        assert tw.check(-1.0 - 1e-4 * i, 0.01, True) is None
    assert tw.trust_scale > shrunk


def test_tripwire_scatter_floor_ignores_plateau_noise():
    """Near-converged SR fluctuates far more than the MC stderr; the
    scatter-based floor must keep ordinary noise from firing.

    A fire here reverts to the best healthy params — benign — so the bound
    is a RATE (a sweep over 30 seeds measured 1 fire per 6000 epochs), not
    zero: the guard must not fire often enough to stall training."""
    import random

    fires = 0
    for seed in range(5):
        rng = random.Random(seed)
        tw = UpdateTripwire(sigma=6.0)
        F0 = 91.95
        for i in range(200):
            tw.snapshot(("p", i))
            # plateau: fluctuation sigma 0.02 >> stderr 0.003
            if tw.check(F0 + rng.gauss(0.0, 0.02), 0.003, True) is not None:
                fires += 1
    assert fires <= 2, fires


def test_tripwire_catches_gradual_runaway():
    """Cumulative ascent above the best anchor fires even when every
    individual step stays below the step threshold."""
    import random

    rng = random.Random(1)
    tw = UpdateTripwire(sigma=6.0)
    F = 92.3
    for i in range(100):  # healthy descent establishes scatter + anchor
        tw.snapshot(("h", i))
        assert tw.check(F, 0.003, True) is None
        F += rng.gauss(-0.003, 0.02)
    caught = None
    for i in range(60):  # runaway: +0.05/epoch, under the single-step threshold
        F += 0.05
        tw.snapshot(("r", i))
        if tw.check(F, 0.003, True) is not None:
            caught = i
            break
    assert caught is not None and caught < 20
