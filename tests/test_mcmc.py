"""Metropolis MCMC sampling correctness (moments of a known target)."""

import jax
import jax.numpy as jnp
import numpy as np

from coulombgas_tpu import mcmc


def test_mcmc_gaussian_target():
    """Walkers equilibrate to a unit Gaussian: check mean/var to 5 sigma."""

    def logp_fn(x):  # (batch, n, dim) -> (batch,)
        return -0.5 * (x**2).sum(axis=(-2, -1))

    B, n, dim = 4096, 2, 2
    x0 = jnp.zeros((B, n, dim), jnp.float64)
    x, accept = jax.jit(lambda x, k: mcmc(logp_fn, x, k, 400, 0.5))(
        x0, jax.random.PRNGKey(0)
    )
    x = np.asarray(x)
    assert 0.2 < float(accept) < 0.95
    # each coordinate ~ N(0, 1)
    mean_err = abs(x.mean())
    var = x.var()
    sigma_mean = 1 / np.sqrt(B * n * dim)
    assert mean_err < 5 * sigma_mean * 3  # autocorrelation slack
    assert abs(var - 1.0) < 0.05


def test_mcmc_invariance_of_target():
    """Starting from the target distribution, moments are preserved."""

    def logp_fn(x):
        return -0.5 * (x**2).sum(axis=(-2, -1))

    B, n, dim = 4096, 2, 2
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, n, dim), jnp.float64)
    x, _ = jax.jit(lambda x, k: mcmc(logp_fn, x, k, 50, 0.3))(x0, jax.random.PRNGKey(2))
    x = np.asarray(x)
    assert abs(x.var() - 1.0) < 0.05
    assert abs(x.mean()) < 0.05
