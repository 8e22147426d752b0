"""Plane-wave Slater determinant tests: symmetries, custom JVP, kinetic oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from coulombgas_tpu import logslaterdet, logslaterdet_ref, sp_orbitals, twist_sort


def _setup(n=7, dim=3, L=1.9):
    indices, _ = sp_orbitals(dim)
    tw, _ = twist_sort(indices, np.full(dim, 0.25))
    k = jnp.asarray(tw[:n], jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, dim), jnp.float64, 0.0, L)
    return k, x, L


def test_antisymmetry():
    k, x, L = _setup()
    perm = np.array([1, 0, 2, 3, 4, 5, 6])  # one transposition: sign -1
    ld = logslaterdet(k, x, L)
    ld_p = logslaterdet(k, x[perm], L)
    # log changes by i*pi (mod 2*pi*i)
    diff = complex(ld_p - ld)
    assert abs(diff.real) < 1e-10
    assert abs((abs(diff.imag) % (2 * np.pi)) - np.pi) < 1e-10


def test_translation_phase():
    """psi(x + a) = e^{i sum_j k_j . a} psi(x)."""
    k, x, L = _setup()
    a = jax.random.normal(jax.random.PRNGKey(1), (1, x.shape[1]), jnp.float64)
    ld = logslaterdet(k, x, L)
    ld_t = logslaterdet(k, x + a, L)
    expected_phase = (2 * jnp.pi / L) * (k * a).sum()
    diff = complex(ld_t - ld)
    assert abs(diff.real) < 1e-9
    assert abs(((diff.imag - float(expected_phase)) + np.pi) % (2 * np.pi) - np.pi) < 1e-9


def test_custom_jvp_matches_generic():
    k, x, L = _setup()
    v = jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float64)

    # jvp
    _, t1 = jax.jvp(lambda x: logslaterdet(k, x, L), (x,), (v,))
    _, t0 = jax.jvp(lambda x: logslaterdet_ref(k, x, L), (x,), (v,))
    np.testing.assert_allclose(complex(t1), complex(t0), rtol=1e-10)

    # grad of real part
    g1 = jax.grad(lambda x: logslaterdet(k, x, L).real)(x)
    g0 = jax.grad(lambda x: logslaterdet_ref(k, x, L).real)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-10)

    # hvp (second-order through the custom rule)
    def hvp(f, x, v):
        return jax.jvp(jax.grad(lambda x: f(x).real), (x,), (v,))[1]

    h1 = hvp(lambda x: logslaterdet(k, x, L), x, v)
    h0 = hvp(lambda x: logslaterdet_ref(k, x, L), x, v)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0), atol=1e-8)


def test_kinetic_eigenstate():
    """The plane-wave determinant is a kinetic eigenstate:
    -lap(log psi) - (grad log psi)^2 == (2 pi / L)^2 sum_j |k_j|^2."""
    k, x, L = _setup()

    def logpsi_ri(x):
        ld = logslaterdet(k, x, L)
        return jnp.stack([ld.real, ld.imag])

    grad = jax.jacrev(logpsi_ri)(x)
    grad = grad[0] + 1j * grad[1]

    nd = x.size
    flat = lambda xf: logpsi_ri(xf.reshape(x.shape))
    eye = jnp.eye(nd, dtype=x.dtype)

    def col(v):
        _, tangent = jax.jvp(jax.jacrev(flat), (x.reshape(-1),), (v,))
        return (tangent * v).sum(axis=-1)

    diag = jax.vmap(col, in_axes=1, out_axes=1)(eye).sum(axis=-1)
    lap = diag[0] + 1j * diag[1]

    kinetic = -lap - (grad**2).sum()
    expected = (2 * jnp.pi / L) ** 2 * (k**2).sum()
    np.testing.assert_allclose(complex(kinetic), complex(expected), rtol=1e-8)
