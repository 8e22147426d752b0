"""Analytic Slater-part Laplacian vs the generic AD engine."""

import jax
import jax.numpy as jnp
import numpy as np

import coulombgas_tpu as cg
from coulombgas_tpu.wavefunction.fast_laplacian import make_logpsi_grad_laplacian_analytic


def _setup(n=7, dim=2, L=4.0):
    idx, _ = cg.sp_orbitals(dim, 9)
    tw, _ = cg.twist_sort(idx, np.full(dim, 0.25))
    sp = np.asarray(tw[::-1].copy(), np.float64)
    M = sp.shape[0]
    fcfg = cg.FermiNetConfig(2, 8, 8, L)
    fp = cg.init_ferminet_params(jax.random.PRNGKey(1), fcfg, dim, jnp.float64)
    flow = lambda p, x: cg.ferminet_apply(p, fcfg, x)
    B = 4
    x = jax.random.uniform(jax.random.PRNGKey(2), (B, n, dim), jnp.float64, 0.0, L)
    sidx = jnp.sort(
        jax.vmap(lambda k: jax.random.choice(k, M, (n,), replace=False))(
            jax.random.split(jax.random.PRNGKey(3), B)
        ).astype(jnp.int32),
        axis=-1,
    )
    return flow, fp, sp, x, sidx, L


def test_analytic_matches_generic_ad():
    flow, fp, sp, x, sidx, L = _setup()
    logpsi_nv = cg.make_logpsi(flow, sp, L)
    _, gl_gen = cg.make_logpsi_grad_laplacian(logpsi_nv)
    gl_fast = make_logpsi_grad_laplacian_analytic(flow, sp, L, hutchinson=False)

    g0, l0 = gl_gen(x, fp, sidx, jax.random.PRNGKey(4))
    g1, l1 = gl_fast(x, fp, sidx, jax.random.PRNGKey(4))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-12)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-10)


def test_analytic_hutchinson_matches_split_hutchinson():
    """Same random v => identical estimate as the reference-style split."""
    flow, fp, sp, x, sidx, L = _setup()
    logpsi_nv = cg.make_logpsi(flow, sp, L)
    logphi, logjacdet = cg.make_logphi_logjacdet(flow, sp, L)
    _, gl_split = cg.make_logpsi_grad_laplacian(
        logpsi_nv, hutchinson=True, logphi=logphi, logjacdet=logjacdet
    )
    gl_fast = make_logpsi_grad_laplacian_analytic(flow, sp, L, hutchinson=True)

    key = jax.random.PRNGKey(7)
    g0, l0 = gl_split(x, fp, sidx, key)
    g1, l1 = gl_fast(x, fp, sidx, key)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-11)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0), rtol=1e-9)


def test_identity_flow_kinetic_eigenvalue():
    """At the identity flow the analytic path gives the exact kinetic energy."""
    flow, fp, sp, x, sidx, L = _setup()
    identity = lambda p, x: x
    gl = make_logpsi_grad_laplacian_analytic(identity, sp, L, hutchinson=False)
    grad, lap = gl(x, fp, sidx, jax.random.PRNGKey(0))
    kinetic = -lap - (grad**2).sum(axis=(-2, -1))
    expected = (2 * jnp.pi / L) ** 2 * (sp[np.asarray(sidx)] ** 2).sum(axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(kinetic.real), expected, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(kinetic.imag), 0.0, atol=1e-8)
