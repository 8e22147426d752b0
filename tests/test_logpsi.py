"""log Psi assembly tests: symmetries, kinetic oracle, Laplacian variants."""

import jax
import jax.numpy as jnp
import numpy as np

from coulombgas_tpu import (
    FermiNetConfig,
    ferminet_apply,
    init_ferminet_params,
    make_logp,
    make_logphi_logjacdet,
    make_logpsi,
    make_logpsi_grad_laplacian,
    sp_orbitals,
    twist_sort,
)


def _setup(n=7, dim=3, L=1.9, batch=4):
    indices, _ = sp_orbitals(dim)
    tw, _ = twist_sort(indices, np.full(dim, 0.25))
    sp = jnp.asarray(tw[::-1].copy(), jnp.float64)
    M = sp.shape[0]
    cfg = FermiNetConfig(depth=2, spsize=8, tpsize=8, L=L)
    params = init_ferminet_params(jax.random.PRNGKey(5), cfg, dim, jnp.float64)
    flow_apply = lambda p, x: ferminet_apply(p, cfg, x)
    logpsi = make_logpsi(flow_apply, sp, L)
    x = jax.random.uniform(jax.random.PRNGKey(0), (batch, n, dim), jnp.float64, 0.0, L)
    sidx = jnp.sort(
        jax.vmap(lambda k: jax.random.choice(k, M, (n,), replace=False))(
            jax.random.split(jax.random.PRNGKey(1), batch)
        ).astype(jnp.int32),
        axis=-1,
    )
    return logpsi, flow_apply, params, sp, x, sidx, L, cfg


def test_periodicity_and_antisymmetry():
    logpsi, flow_apply, params, sp, x, sidx, L, cfg = _setup()
    x0, s0 = x[0], sidx[0]
    lp = logpsi(x0, params, s0)

    # logp = 2 Re logpsi is invariant under lattice translation of one electron
    shift = jnp.zeros_like(x0).at[2].add(jnp.array([L, 0.0, 2 * L]))
    lp_shift = logpsi(x0 + shift, params, s0)
    np.testing.assert_allclose(float(lp_shift[0]), float(lp[0]), atol=1e-9)

    # antisymmetry: swapping two electrons flips the sign -> Re unchanged,
    # Im changes by pi mod 2 pi
    perm = np.arange(x0.shape[0])
    perm[0], perm[1] = 1, 0
    lp_perm = logpsi(x0[perm], params, s0)
    np.testing.assert_allclose(float(lp_perm[0]), float(lp[0]), atol=1e-9)
    dphi = float(lp_perm[1] - lp[1])
    assert abs(abs(dphi) % (2 * np.pi) - np.pi) < 1e-9


def test_identity_flow_kinetic_oracle():
    """With the identity flow, local kinetic energy is the exact eigenvalue."""
    _, _, params, sp, x, sidx, L, _ = _setup()
    identity_flow = lambda p, x: x
    logpsi = make_logpsi(identity_flow, sp, L)
    _, grad_lap = make_logpsi_grad_laplacian(logpsi)
    grad, lap = grad_lap(x, params, sidx, jax.random.PRNGKey(2))
    kinetic = -lap - (grad**2).sum(axis=(-2, -1))
    expected = (2 * jnp.pi / L) ** 2 * (sp[sidx] ** 2).sum(axis=(-2, -1))
    np.testing.assert_allclose(np.asarray(kinetic.real), np.asarray(expected), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(kinetic.imag), 0.0, atol=1e-7)


def test_laplacian_vmap_vs_forloop():
    logpsi, _, params, sp, x, sidx, L, _ = _setup()
    _, gl_v = make_logpsi_grad_laplacian(logpsi, forloop=False)
    _, gl_f = make_logpsi_grad_laplacian(logpsi, forloop=True)
    g1, l1 = gl_v(x, params, sidx, jax.random.PRNGKey(0))
    g2, l2 = gl_f(x, params, sidx, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-10)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-8)


def test_hutchinson_unbiased():
    """Hutchinson estimate (split variant) converges to the exact Laplacian."""
    logpsi, flow_apply, params, sp, x, sidx, L, cfg = _setup(n=5, dim=2, batch=1)
    logphi, logjacdet = make_logphi_logjacdet(flow_apply, sp, L)
    _, gl_exact = make_logpsi_grad_laplacian(logpsi)
    _, gl_hutch = make_logpsi_grad_laplacian(
        logpsi, hutchinson=True, logphi=logphi, logjacdet=logjacdet
    )

    B = 1024
    xb = jnp.repeat(x, B, axis=0)
    sb = jnp.repeat(sidx, B, axis=0)
    _, lap_exact = gl_exact(x, params, sidx, jax.random.PRNGKey(0))
    g, lap_h = jax.jit(gl_hutch)(xb, params, sb, jax.random.PRNGKey(3))

    mean = complex(lap_h.mean())
    std = float(lap_h.real.std() / np.sqrt(B))
    exact = complex(lap_exact[0])
    assert abs(mean.real - exact.real) < 5 * std + 1e-6
    # gradients from the split variant match the exact ones
    g_exact, _ = gl_exact(x, params, sidx, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(g[:1]), np.asarray(g_exact), atol=1e-8)


def test_logp_translation_invariance():
    logpsi, _, params, sp, x, sidx, L, _ = _setup()
    logp = make_logp(logpsi)
    a = jax.random.normal(jax.random.PRNGKey(9), (1, 1, x.shape[-1]), jnp.float64)
    lp0 = logp(x, params, sidx)
    lp1 = logp(x + a, params, sidx)
    np.testing.assert_allclose(np.asarray(lp0), np.asarray(lp1), atol=1e-8)
