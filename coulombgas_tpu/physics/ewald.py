"""Ewald summation of the periodic Coulomb interaction, TPU-first.

Capability parity with reference src/potential.py (kpoints, Madelung, psi,
potential_energy), redesigned for TPU:

  * no ``triu_indices`` gathers — the pair displacement tensor is kept dense
    (n, n, dim) and the upper triangle is selected with a mask, which XLA
    fuses into the elementwise pipeline instead of emitting gathers;
  * the long-range reciprocal sum is evaluated as a single
    (n*n, dim) x (dim, NG) matmul feeding cos() — this is the FLOP-heavy part
    and lands on the MXU;
  * everything is batched over samples with vmap; dtype follows the caller.

Units and conventions are identical to the reference: box of unit length for
``ewald_sum``, nearest-image-only minimum-image convention for the short-range
part, energies in Ry/rs^2 from ``potential_energy``.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

__all__ = [
    "kpoints", "madelung", "ewald_sum", "ewald_sum_pairs",
    "potential_energy", "Madelung", "psi",
]


def kpoints(dim: int, Gmax: int) -> np.ndarray:
    """Integer reciprocal-mesh points with 0 < |G| <= Gmax.

    (reference: src/potential.py:7-17).  Host-side numpy; the result is a
    static constant baked into the jitted energy computation.
    """
    rng = np.arange(-Gmax, Gmax + 1)
    grids = np.meshgrid(*([rng] * dim), indexing="ij")
    G = np.stack([g.ravel() for g in grids], axis=-1)
    G2 = np.sum(G**2, axis=-1)
    return G[(G2 <= Gmax**2) & (G2 > 0)]


def _gk_g0(dim: int, kappa, Gnorm):
    """Reciprocal-space kernel g_k and G=0 correction g_0 (unit box)."""
    if dim == 3:
        g_k = jnp.exp(-(jnp.pi**2) * Gnorm**2 / kappa**2) / (jnp.pi * Gnorm**2)
        g_0 = -jnp.pi / kappa**2
    elif dim == 2:
        g_k = erfc(jnp.pi * Gnorm / kappa) / Gnorm
        g_0 = -2 * jnp.sqrt(jnp.pi) / kappa
    else:
        raise ValueError(f"Ewald sum only implemented for dim in (2, 3), got {dim}")
    return g_k, g_0


def madelung(dim: int, kappa, G) -> jnp.ndarray:
    """Madelung constant of the simple-cubic lattice with L=1.

    The electrostatic potential felt by a unit charge at its own lattice site
    (reference: src/potential.py:19-34).
    """
    G = jnp.asarray(G)
    Gnorm = jnp.linalg.norm(G.astype(jnp.result_type(float)), axis=-1)
    g_k, g_0 = _gk_g0(dim, kappa, Gnorm)
    return g_k.sum() + g_0 - 2 * kappa / jnp.sqrt(jnp.pi)


def ewald_sum(x, kappa, G) -> jnp.ndarray:
    """Coordinate-dependent electrostatic energy for a unit periodic box.

    ``0.5 * sum_{i != j} psi(r_i, r_j)`` with the Ewald split at screening
    parameter ``kappa``; the Madelung self-term is *not* included (add
    ``0.5 * n * madelung(...)``) — same convention as reference
    src/potential.py:36-66.

    The reciprocal sum uses the structure factor S(G) = sum_i e^{2 pi i G.u_i}:

        sum_{i<j} cos(2 pi G . r_ij) = (|S(G)|^2 - n) / 2,

    exact because G is integer (the minimum-image shift drops out of the
    periodic cosine).  This is O(n * NG) where the reference's pair sum
    (src/potential.py:52-62) is O(n^2 * NG), and the phase table is a single
    (n x dim)(dim x NG) matmul on the MXU.  Differentially tested against the
    dense pair implementation below.

    INPUT: x (n, dim) in the unit box; G (NG, dim) integer mesh.
    """
    n, dim = x.shape
    dtype = x.dtype
    G = jnp.asarray(G, dtype=dtype)

    # Dense pair displacements with nearest-image minimum-image convention.
    rij = x[:, None, :] - x[None, :, :]
    rij = rij - jnp.rint(rij)

    # Strict upper-triangle pair mask (i < j), dense — no gathers.
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)

    # Short range: erfc(kappa d)/d over unique pairs.  The diagonal distance
    # is 0; shift it to 1 under the mask to keep the division finite.
    d2 = jnp.sum(rij**2, axis=-1)
    d = jnp.sqrt(jnp.where(iu, d2, 1.0))
    V_short = jnp.sum(jnp.where(iu, erfc(kappa * d) / d, 0.0))

    # Long range via the structure factor.
    Gnorm = jnp.linalg.norm(G, axis=-1)
    g_k, g_0 = _gk_g0(dim, kappa, Gnorm)
    theta = 2 * jnp.pi * (x @ G.T)  # (n, NG) phases — one MXU matmul
    S2 = jnp.cos(theta).sum(axis=0) ** 2 + jnp.sin(theta).sum(axis=0) ** 2
    npairs = n * (n - 1) // 2
    V_long = jnp.sum(g_k * (S2 - n)) / 2 + g_0 * npairs

    return V_short + V_long


def ewald_sum_pairs(x, kappa, G) -> jnp.ndarray:
    """Dense O(n^2 * NG) pair-sum evaluation of the reciprocal part.

    Mathematically identical to ``ewald_sum`` (reference algorithm,
    src/potential.py:36-66); kept as the differential-test oracle.
    """
    n, dim = x.shape
    G = jnp.asarray(G, dtype=x.dtype)
    rij = x[:, None, :] - x[None, :, :]
    rij = rij - jnp.rint(rij)
    iu = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    d2 = jnp.sum(rij**2, axis=-1)
    d = jnp.sqrt(jnp.where(iu, d2, 1.0))
    V_short = jnp.sum(jnp.where(iu, erfc(kappa * d) / d, 0.0))

    Gnorm = jnp.linalg.norm(G, axis=-1)
    g_k, g_0 = _gk_g0(dim, kappa, Gnorm)
    phases = 2 * jnp.pi * jnp.einsum("gd,ijd->gij", G, rij)
    pair_cos = jnp.sum(jnp.where(iu[None], jnp.cos(phases), 0.0), axis=(-2, -1))
    npairs = n * (n - 1) // 2
    V_long = jnp.sum(g_k * pair_cos) + g_0 * npairs
    return V_short + V_long


def potential_energy(x, kappa, G, L, rs) -> jnp.ndarray:
    """Batched potential energy in Ry/rs^2 for a box of size L.

    Only the coordinate-dependent part; add ``n*rs/L * madelung(dim, kappa, G)``
    for the constant piece (reference: src/potential.py:69-77).

    INPUT: x (batch, n, dim).
    OUTPUT: (batch,).
    """
    return jax.vmap(lambda xi: 2 * rs / L * ewald_sum(xi / L, kappa, G))(x)


# Reference-compatible aliases (reference public API names).
Madelung = madelung
psi = ewald_sum
