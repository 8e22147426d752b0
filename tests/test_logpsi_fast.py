"""make_logpsi_fast and flow_jac-powered Laplacian vs the generic-AD paths.

These are the AD-heart equivalences: values, parameter scores (what the
quantum Fisher and loss differentiate), coordinate gradients, and the
Laplacian must all match the slogdet/jacfwd construction.
"""

import jax
import jax.numpy as jnp
import numpy as np

import coulombgas_tpu as cg
from coulombgas_tpu.wavefunction.fast_laplacian import make_logpsi_grad_laplacian_analytic
from coulombgas_tpu.wavefunction.logpsi import (
    make_logpsi,
    make_logpsi_fast,
    make_logpsi_grad_laplacian,
    make_quantum_score,
)


def _setup(n=7, dim=2, Emax=9, batch=6, dtype=jnp.float64, seed=0, depth=2):
    L = float(np.sqrt(np.pi * n)) if dim == 2 else (4 / 3 * np.pi * n) ** (1 / 3)
    sp_indices, _ = cg.sp_orbitals(dim, Emax)
    sp, _ = cg.twist_sort(sp_indices, np.full(dim, 0.25))
    sp = np.asarray(sp[::-1].copy(), np.dtype(dtype).name)
    key = jax.random.PRNGKey(seed)
    flow_cfg = cg.FermiNetConfig(depth, 8, 8, L)
    params = cg.init_ferminet_params(key, flow_cfg, dim, dtype)
    flow_apply = lambda p, xx: cg.ferminet_apply(p, flow_cfg, xx)
    flow_jac = lambda p, xx: cg.ferminet_apply_and_jac(p, flow_cfg, xx)
    x = jax.random.uniform(key, (batch, n, dim), dtype, 0.0, L)
    si = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (batch, 1))
    return flow_apply, flow_jac, params, sp, L, x, si


def test_logpsi_fast_values():
    flow_apply, flow_jac, params, sp, L, x, si = _setup()
    slow = make_logpsi(flow_apply, sp, L)
    fast = make_logpsi_fast(flow_jac, sp, L)
    for b in range(x.shape[0]):
        np.testing.assert_allclose(
            np.asarray(fast(x[b], params, si[b])),
            np.asarray(slow(x[b], params, si[b])),
            rtol=1e-10, atol=1e-10,
        )


def test_logpsi_fast_quantum_score():
    """Parameter derivatives (the quantum Fisher inputs) must agree."""
    flow_apply, flow_jac, params, sp, L, x, si = _setup(batch=3)
    score_slow = make_quantum_score(make_logpsi(flow_apply, sp, L))
    score_fast = make_quantum_score(make_logpsi_fast(flow_jac, sp, L))
    s1 = score_slow(x, params, si)
    s2 = score_fast(x, params, si)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-9
        ),
        s1, s2,
    )


def test_flowjac_laplacian_engine_matches_generic():
    """Analytic engine with flow_jac vs generic forward-over-reverse AD."""
    flow_apply, flow_jac, params, sp, L, x, si = _setup(depth=3)
    logpsi = make_logpsi(flow_apply, sp, L)
    _, gl_generic = make_logpsi_grad_laplacian(logpsi)
    gl_flowjac = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp, L, hutchinson=False, flow_jac=flow_jac
    )
    key = jax.random.PRNGKey(1)
    g1, l1 = gl_generic(x, params, si, key)
    g2, l2 = gl_flowjac(x, params, si, key)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-7, atol=1e-7)


def test_flowjac_hutchinson_matches_hutchinson():
    """Same Hutchinson probe => identical estimate through either logjacdet."""
    flow_apply, flow_jac, params, sp, L, x, si = _setup()
    key = jax.random.PRNGKey(2)
    gl_a = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp, L, hutchinson=True, flow_jac=None
    )
    gl_b = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp, L, hutchinson=True, flow_jac=flow_jac
    )
    g1, l1 = gl_a(x, params, si, key)
    g2, l2 = gl_b(x, params, si, key)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-7, atol=1e-7)


def test_flowjaclap_engine_matches_generic():
    """Fully-analytic engine (flow_jac_lap) vs generic forward-over-reverse."""
    flow_apply, flow_jac, params, sp, L, x, si = _setup(depth=3)
    flow_cfg = cg.FermiNetConfig(3, 8, 8, L)
    flow_jac_lap = lambda p, xx: cg.ferminet_apply_jac_lap(p, flow_cfg, xx)
    logpsi = make_logpsi(flow_apply, sp, L)
    _, gl_generic = make_logpsi_grad_laplacian(logpsi)
    gl_full = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp, L, hutchinson=False, flow_jac_lap=flow_jac_lap
    )
    key = jax.random.PRNGKey(4)
    g1, l1 = gl_generic(x, params, si, key)
    g2, l2 = gl_full(x, params, si, key)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-7, atol=1e-7)


def test_flowjaclap_hutchinson_matches():
    flow_apply, flow_jac, params, sp, L, x, si = _setup()
    flow_cfg = cg.FermiNetConfig(2, 8, 8, L)
    flow_jac_lap = lambda p, xx: cg.ferminet_apply_jac_lap(p, flow_cfg, xx)
    key = jax.random.PRNGKey(5)
    gl_a = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp, L, hutchinson=True, flow_jac=None
    )
    gl_b = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp, L, hutchinson=True, flow_jac_lap=flow_jac_lap
    )
    g1, l1 = gl_a(x, params, si, key)
    g2, l2 = gl_b(x, params, si, key)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1), rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=1e-7, atol=1e-7)
