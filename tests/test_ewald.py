"""Ewald summation tests: mesh shapes and parameter-independence.

Stronger than the reference (tests/test_potential.py prints a sweep without
asserting): here convergence across (kappa, Gmax) is asserted numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from coulombgas_tpu import ewald_sum, kpoints, madelung, potential_energy
from coulombgas_tpu.physics.ewald import ewald_sum_pairs


def test_structure_factor_matches_pair_sum():
    """O(n*NG) structure-factor form == O(n^2*NG) dense pair sum."""
    import jax
    import jax.numpy as jnp

    for dim in (2, 3):
        x = jax.random.uniform(jax.random.PRNGKey(0), (9, dim), jnp.float64)
        G = jnp.asarray(kpoints(dim, 12), jnp.float64)
        a = float(ewald_sum(x, 10.0, G))
        b = float(ewald_sum_pairs(x, 10.0, G))
        np.testing.assert_allclose(a, b, rtol=1e-12)


def test_kpoints_shape():
    for dim in (2, 3):
        G = kpoints(dim, 5)
        G = np.asarray(G)
        G2 = (G**2).sum(axis=-1)
        assert G.shape[1] == dim
        assert G2.min() > 0 and G2.max() <= 25
        # inversion symmetry
        s = {tuple(g) for g in G}
        assert all(tuple(-g) in s for g in G)


def _total_energy(x, n, kappa, Gmax, dim):
    G = kpoints(dim, Gmax)
    return float(ewald_sum(x, kappa, jnp.asarray(G, jnp.float64))) + 0.5 * n * float(
        madelung(dim, kappa, jnp.asarray(G, jnp.float64))
    )


def test_ewald_parameter_independence():
    """The total electrostatic energy must not depend on the Ewald split."""
    for dim in (2, 3):
        n = 7
        x = jax.random.uniform(jax.random.PRNGKey(0), (n, dim), jnp.float64)
        vals = [
            _total_energy(x, n, kappa, Gmax, dim)
            for kappa, Gmax in [(9.0, 14), (10.0, 15), (12.0, 18)]
        ]
        assert np.ptp(vals) < 1e-8, f"dim={dim}: Ewald values {vals} not converged"


def test_two_charge_symmetry():
    """V(x) == V(1-x) by inversion symmetry of the lattice sum."""
    dim, n = 2, 4
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, dim), jnp.float64)
    G = jnp.asarray(kpoints(dim, 15), jnp.float64)
    v1 = float(ewald_sum(x, 10.0, G))
    v2 = float(ewald_sum(1.0 - x, 10.0, G))
    np.testing.assert_allclose(v1, v2, rtol=1e-10)


def test_potential_energy_batched_and_scaled():
    dim, n, L, rs = 2, 5, 3.7, 2.0
    xb = jax.random.uniform(jax.random.PRNGKey(2), (3, n, dim), jnp.float64, 0.0, L)
    G = jnp.asarray(kpoints(dim, 15), jnp.float64)
    V = potential_energy(xb, 10.0, G, L, rs)
    assert V.shape == (3,)
    v0 = 2 * rs / L * float(ewald_sum(xb[0] / L, 10.0, G))
    np.testing.assert_allclose(float(V[0]), v0, rtol=1e-12)
