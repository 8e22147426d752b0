"""FermiNet flow equivariance tests (reference: tests/test_flow.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from coulombgas_tpu import FermiNetConfig, ferminet_apply, init_ferminet_params


def _setup(n=7, dim=3, L=1.234):
    cfg = FermiNetConfig(depth=3, spsize=16, tpsize=16, L=L)
    params = init_ferminet_params(jax.random.PRNGKey(42), cfg, dim, jnp.float64)
    x = jax.random.uniform(jax.random.PRNGKey(0), (n, dim), jnp.float64, 0.0, L)
    return cfg, params, x, L


def test_lattice_translation():
    """f(x + R*L) = f(x) + R*L for integer lattice vectors R."""
    cfg, params, x, L = _setup()
    R = jax.random.randint(jax.random.PRNGKey(1), x.shape, -3, 4).astype(x.dtype)
    z1 = ferminet_apply(params, cfg, x + R * L)
    z0 = ferminet_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0 + R * L), atol=1e-9)


def test_continuous_translation():
    """f(x + a) = f(x) + a for any uniform shift a."""
    cfg, params, x, L = _setup()
    a = jax.random.normal(jax.random.PRNGKey(2), (1, x.shape[1]), x.dtype)
    z1 = ferminet_apply(params, cfg, x + a)
    z0 = ferminet_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0 + a), atol=1e-9)


def test_permutation_equivariance():
    cfg, params, x, L = _setup()
    perm = jax.random.permutation(jax.random.PRNGKey(3), x.shape[0])
    z_perm = ferminet_apply(params, cfg, x[perm])
    z = ferminet_apply(params, cfg, x)
    np.testing.assert_allclose(np.asarray(z_perm), np.asarray(z[perm]), atol=1e-10)


def test_near_identity_at_init():
    """Small init keeps the flow near the identity map."""
    cfg, params, x, L = _setup()
    z = ferminet_apply(params, cfg, x)
    assert float(jnp.abs(z - x).max()) < 0.5
