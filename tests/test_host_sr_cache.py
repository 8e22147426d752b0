"""HostFisherCache (--sr_solver host64 --fisher_refresh K) unit tests.

The cache must be EXACTLY the plain host64 apply when refreshed on the same
accumulators, and exactly "host64 with the Fisher second-moment blocks frozen
at the last refresh" on stale epochs — all f64, so the comparisons are at
LAPACK-roundoff tolerance, not MC tolerance.
"""

import numpy as np
import pytest

from coulombgas_tpu.optim.host_sr import (
    HostFisherCache, host_hybrid_apply, sym_pack, sym_unpack,
)

P_VAN, P_FLOW, BATCH, K = 17, 11, 64, 3


def _acc(seed, with_fishers=True):
    """Synthetic accumulator pytree with host64's layout (K acc-step sums)."""
    rng = np.random.RandomState(seed)
    s_c = rng.randn(BATCH, P_VAN)
    s_q = rng.randn(BATCH, P_FLOW) + 1j * rng.randn(BATCH, P_FLOW)
    data = {k: np.float32(v) for k, v in [
        ("F_mean", K * rng.randn()), ("F2_mean", K * abs(rng.randn())),
        ("E_mean", K * rng.randn()), ("E2_mean", K * abs(rng.randn())),
        ("K_mean", K), ("K2_mean", K), ("V_mean", K), ("V2_mean", K),
        ("S_mean", K), ("S2_mean", K)]}
    acc = {
        "data": data,
        "grads": ({"w": np.float32(K * rng.randn(P_VAN))},
                  {"a": np.float32(K * rng.randn(P_FLOW))}),
        "classical_score": {"w": np.float32(K * s_c.mean(0))},
        "quantum_score": {"a": np.float32(K * 2.0 * s_q.real.mean(0))},
        "quantum_score_mean": np.float32(
            K * np.stack([s_q.mean(0).real, s_q.mean(0).imag])),
    }
    if with_fishers:
        acc["classical_fisher"] = np.float32(K * s_c.T @ s_c / BATCH)
        acc["quantum_fisher"] = np.float32(K * (s_q.conj().T @ s_q).real / BATCH)
    return acc


@pytest.mark.parametrize("packed", [False, True], ids=["full", "sym_packed"])
def test_refresh_epoch_matches_plain_host64(packed):
    acc = _acc(0)
    if packed:
        import jax.numpy as jnp

        acc = dict(acc,
                   classical_fisher=np.asarray(sym_pack(jnp.asarray(acc["classical_fisher"]))),
                   quantum_fisher=np.asarray(sym_pack(jnp.asarray(acc["quantum_fisher"]))))
    uv0, uf0, d0, diag0 = host_hybrid_apply(acc, K, 1e-3, 1e-3)
    cache = HostFisherCache(1e-3)
    uv1, uf1, d1, diag1 = host_hybrid_apply(acc, K, 1e-3, 1e-3, cache=cache)
    np.testing.assert_allclose(uv1, uv0, rtol=0, atol=1e-13)
    np.testing.assert_allclose(uf1, uf0, rtol=0, atol=1e-13)
    assert d1 == d0
    for k in diag0:
        assert np.isclose(diag1[k], diag0[k], rtol=1e-10), k
    assert cache.ready and cache.age == 0


def test_stale_epoch_uses_frozen_fishers_with_current_everything_else():
    acc_a, acc_b = _acc(1), _acc(2, with_fishers=False)
    cache = HostFisherCache(1e-3)
    host_hybrid_apply(acc_a, K, 1e-3, 1e-3, cache=cache)  # refresh from A

    uv, uf, d, diag = host_hybrid_apply(acc_b, K, 1e-3, 1e-3, cache=cache)
    assert cache.age == 1

    # reference: plain host64 on B's leaves with A's Fisher blocks spliced in
    acc_mixed = dict(acc_b, classical_fisher=_acc(1)["classical_fisher"],
                     quantum_fisher=_acc(1)["quantum_fisher"])
    uv0, uf0, d0, _ = host_hybrid_apply(acc_mixed, K, 1e-3, 1e-3)
    np.testing.assert_allclose(uv, uv0, rtol=0, atol=1e-13)
    np.testing.assert_allclose(uf, uf0, rtol=0, atol=1e-13)
    assert d == d0


def test_stale_centering_uses_current_mean_score():
    """The rank-2 centering must track the CURRENT epoch's mean score."""
    acc_a = _acc(3)
    acc_b = _acc(4, with_fishers=False)
    acc_c = _acc(5, with_fishers=False)
    # give B and C identical gradients but different mean scores
    acc_c["grads"] = acc_b["grads"]
    acc_c["quantum_score"] = acc_b["quantum_score"]
    acc_c["classical_score"] = acc_b["classical_score"]
    acc_c["data"] = acc_b["data"]
    assert not np.allclose(acc_c["quantum_score_mean"], acc_b["quantum_score_mean"])

    cache = HostFisherCache(1e-3)
    host_hybrid_apply(acc_a, K, 1e-3, 1e-3, cache=cache)
    _, uf_b, _, _ = host_hybrid_apply(acc_b, K, 1e-3, 1e-3, cache=cache)
    _, uf_c, _, _ = host_hybrid_apply(acc_c, K, 1e-3, 1e-3, cache=cache)
    assert not np.allclose(uf_b, uf_c), (
        "quantum updates identical despite different mean scores — the "
        "centering is not per-epoch")


def test_zero_step_guard_on_indefinite_stale_center():
    """A stale Fisher + huge current mean score -> indefinite centered block
    -> the gnorm <= 0 guard must produce a null step, not garbage."""
    acc_a = _acc(6)
    acc_b = _acc(7, with_fishers=False)
    acc_b["quantum_score_mean"] = np.float32(
        K * 100.0 * np.ones((2, P_FLOW)))  # centering overwhelms the Fisher
    # point the gradient along the negative-curvature (mean-score) direction
    # so g^T M^{-1} g < 0 for the indefinite centered block
    acc_b["grads"] = (acc_b["grads"][0], {"a": np.float32(np.ones(P_FLOW))})
    acc_b["quantum_score"] = {"a": np.float32(np.zeros(P_FLOW))}
    cache = HostFisherCache(1e-3)
    host_hybrid_apply(acc_a, K, 1e-3, 1e-3, cache=cache)
    _, uf, _, diag = host_hybrid_apply(acc_b, K, 1e-3, 1e-3, cache=cache)
    assert diag["scale_flow"] == 0.0
    assert np.all(uf == 0.0)


def test_stale_epoch_with_fresh_quantum_fisher():
    """Production path (main.py host64): stale epochs still carry a FRESH
    quantum_fisher — the quantum solve must use it (exactly plain host64 on
    the quantum block) while the classical solve stays on the cached factor."""
    acc_a = _acc(9)
    acc_b = _acc(10, with_fishers=True)
    del acc_b["classical_fisher"]  # stale-classical, fresh-quantum epoch

    cache = HostFisherCache(1e-3)
    host_hybrid_apply(acc_a, K, 1e-3, 1e-3, cache=cache)
    uv, uf, d, diag = host_hybrid_apply(acc_b, K, 1e-3, 1e-3, cache=cache)
    assert cache.age == 1

    # classical: matches A's Fisher spliced in; quantum: matches B's own
    acc_mixed = dict(acc_b, classical_fisher=_acc(9)["classical_fisher"])
    uv0, uf0, d0, _ = host_hybrid_apply(acc_mixed, K, 1e-3, 1e-3)
    np.testing.assert_allclose(uv, uv0, rtol=0, atol=1e-13)
    np.testing.assert_allclose(uf, uf0, rtol=0, atol=1e-13)
    assert d == d0

    # and the packed (sym_pack) quantum layout must solve identically
    import jax.numpy as jnp

    cache2 = HostFisherCache(1e-3)
    host_hybrid_apply(acc_a, K, 1e-3, 1e-3, cache=cache2)
    acc_bp = dict(acc_b, quantum_fisher=np.asarray(
        sym_pack(jnp.asarray(acc_b["quantum_fisher"]))))
    _, uf_p, _, _ = host_hybrid_apply(acc_bp, K, 1e-3, 1e-3, cache=cache2)
    np.testing.assert_allclose(uf_p, uf, rtol=0, atol=1e-13)


def test_sym_pack_roundtrip_through_cache():
    M = np.random.RandomState(8).randn(9, 9)
    M = np.float32(M + M.T)
    import jax.numpy as jnp

    np.testing.assert_array_equal(sym_unpack(np.asarray(sym_pack(jnp.asarray(M)))),
                                  np.float64(M))


def test_damped_upper_matches_full_build_bitwise():
    """The upper-only fast path must equal sym_unpack(v)/K + damping*eye on
    the triangle the Cholesky reads — bitwise, so host64 results are
    independent of which build path ran."""
    from coulombgas_tpu.optim.host_sr import damped_upper

    rng = np.random.RandomState(11)
    P, K, damping = 37, 3, 1e-3
    A = rng.randn(P, P).astype(np.float32)
    A = A + A.T
    iu = np.triu_indices(P)
    v = A[iu[0], iu[1]]

    ref = sym_unpack(v) / K + damping * np.eye(P)
    fast = damped_upper(v, K, damping)
    np.testing.assert_array_equal(fast[iu[0], iu[1]], ref[iu[0], iu[1]])
