"""Plane-wave Slater determinants with a structure-exploiting custom JVP.

log det[ L^(-dim/2) exp(i k_j . x_i) ] as a complex log (with phase).
Capability parity with reference src/slater.py:4-44, built independently.

The custom JVP avoids differentiating through the LU factorization inside
slogdet: for D_ij = c * exp(i k_j . x_i) the derivative of each entry w.r.t.
x_i is D_ij * (i k_j . dx_i), so

    d logdet = tr(D^{-1} dD) = sum_ij (D * i (k . dx))_ij * (D^{-1})_ji .

This matters doubly on TPU: (a) the primal slogdet runs once per JVP instead
of inside the AD graph, and (b) complex support on TPU is c64-only, so fewer
complex decompositions in the autodiff graph means less precision loss.  The
rule is itself built from differentiable ops (exp/inv), so higher-order AD
(the Laplacian's forward-over-reverse) works through it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["logslaterdet", "logslaterdet_ref"]


def _planewave_matrix(indices, x, L):
    """D_ij = L^(-dim/2) exp(i k_j . x_i), with k = 2*pi/L * indices."""
    _, dim = x.shape
    k = 2 * jnp.pi / L * indices
    k_dot_x = x @ k.T  # (n_x, n_k)
    cdtype = jnp.complex128 if x.dtype == jnp.float64 else jnp.complex64
    return L ** (-dim / 2) * jnp.exp(1j * k_dot_x.astype(cdtype))


def logslaterdet_ref(indices, x, L):
    """Generic-AD version (no custom rule); differential-test oracle.

    INPUT: indices (n, dim) float momenta (may include the twist), x (n, dim).
    OUTPUT: complex scalar log det D = log|det D| + i*arg(det D).
    """
    D = _planewave_matrix(indices, x, L)
    phase, logabsdet = jnp.linalg.slogdet(D)
    return logabsdet + jnp.log(phase)


@jax.custom_jvp
def logslaterdet(indices, x, L):
    """log det of the plane-wave Slater matrix; custom JVP in x."""
    return logslaterdet_ref(indices, x, L)


@logslaterdet.defjvp
def _logslaterdet_jvp(primals, tangents):
    indices, x, L = primals
    _, dx, _ = tangents

    D = _planewave_matrix(indices, x, L)
    phase, logabsdet = jnp.linalg.slogdet(D)
    primal_out = logabsdet + jnp.log(phase)

    k = 2 * jnp.pi / L * indices
    k_dot_dx = dx @ k.T  # (n, n): row i = k_j . dx_i
    # tr(D^{-1} dD) with dD = D * (i k.dx); contract without forming D^{-1} D.
    # D^{-1} stays an LU inverse: a Gram-form inverse (ops/logdet.py) squares
    # the conditioning, and near-node walkers (two electrons close => two
    # near-equal rows of D) then lose ALL f32 digits in the kinetic energy
    # (caught by tests/test_f32.py::test_identity_flow_kinetic_f32).  The
    # well-conditioned-by-construction flow-Jacobian Gram is handled
    # closed-form instead (logdet_spd_single), which is where the batched-LU
    # traffic in the AD paths actually was.
    tangent_out = jnp.sum(D * (1j * k_dot_dx) * jnp.linalg.inv(D).T)
    return primal_out, tangent_out
