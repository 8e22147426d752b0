"""Assembly of log Psi and its derivatives (gradient, Laplacian, scores).

log Psi_k(x) = log det[planewave_k(z)] + 1/2 log det(dz/dx),  z = flow(x).

Capability parity with reference src/logpsi.py (make_logpsi,
make_logphi_logjacdet, make_logpsi_grad_laplacian, make_logp,
make_quantum_score), redesigned for TPU:

  * complex results are carried as real 2-vectors (Re, Im) to keep AD real —
    same convention as the reference — and the complex dtype is c64 on TPU;
  * the exact Laplacian defaults to the *vmapped-basis* forward-over-reverse
    formulation: all n*dim Hessian columns are evaluated as one batched jvp,
    which XLA turns into large fused batched matmuls (MXU) instead of the
    reference's sequential fori_loop (reference keeps fori as default,
    src/logpsi.py:86-92); the fori variant is retained for memory-bound
    configurations;
  * the Hutchinson estimator supports the production split (exact Laplacian
    of the Slater part + stochastic estimate of the Jacobian part only,
    reference src/logpsi.py:134-164).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.slater import logslaterdet

__all__ = [
    "make_logpsi",
    "make_logpsi_fast",
    "make_logphi_logjacdet",
    "make_logpsi_grad_laplacian",
    "make_logp",
    "make_quantum_score",
]


def make_logpsi(flow_apply, sp_indices, L):
    """logpsi(x, params, state_idx) -> (2,) array [Re log Psi, Im log Psi].

    ``flow_apply(params, x)`` is the normalizing flow; ``sp_indices`` the
    (M, dim) float array of twisted momenta indexed by ``state_idx``.
    """
    sp_indices = np.asarray(sp_indices)  # host constant (see autoregressive.py)

    def logpsi(x, params, state_idx):
        z = flow_apply(params, x)
        log_phi = logslaterdet(jnp.asarray(sp_indices)[state_idx], z, L)

        n, dim = x.shape
        flow_flat = lambda xf: flow_apply(params, xf.reshape(n, dim)).reshape(-1)
        jac = jax.jacfwd(flow_flat)(x.reshape(-1))
        _, logjacdet = jnp.linalg.slogdet(jac)
        return jnp.stack([log_phi.real + 0.5 * logjacdet, log_phi.imag])

    return logpsi


def make_logpsi_fast(flow_jac, sp_indices, L):
    """logpsi via the analytic flow Jacobian + differentiable Gram log-det.

    Same contract as ``make_logpsi`` — logpsi(x, params, state_idx) -> (2,)
    [Re, Im] — but built for the TPU AD paths: ``flow_jac(params, x) ->
    (z, J (nd, nd))`` is the pair-local analytic Jacobian
    (models/ferminet_jac.py), and the 1/2 log|det J| term is
    1/4 log det(J J^T) through the pivot-free Cholesky (ops/logdet.py), so
    no jacfwd fan-out and no LU enter any derivative of log Psi (parameter
    scores, coordinate gradients, the Laplacian's second order).
    Differentially tested against make_logpsi in tests/test_logpsi_fast.py.
    """
    from ..ops.logdet import logdet_spd_single

    sp_indices = np.asarray(sp_indices)

    def logpsi(x, params, state_idx):
        z, J = flow_jac(params, x)
        log_phi = logslaterdet(jnp.asarray(sp_indices)[state_idx], z, L)
        logjacdet = 0.5 * logdet_spd_single(J @ J.T)  # = log |det J|
        return jnp.stack([log_phi.real + 0.5 * logjacdet, log_phi.imag])

    return logpsi


def make_logphi_logjacdet(flow_apply, sp_indices, L):
    """Split version of make_logpsi: Slater term and Jacobian term separately."""
    sp_indices = np.asarray(sp_indices)

    def logphi(x, params, state_idx):
        z = flow_apply(params, x)
        log_phi = logslaterdet(jnp.asarray(sp_indices)[state_idx], z, L)
        return jnp.stack([log_phi.real, log_phi.imag])

    def logjacdet(x, params):
        n, dim = x.shape
        flow_flat = lambda xf: flow_apply(params, xf.reshape(n, dim)).reshape(-1)
        jac = jax.jacfwd(flow_flat)(x.reshape(-1))
        _, ljd = jnp.linalg.slogdet(jac)
        return 0.5 * ljd

    return logphi, logjacdet


def _exact_laplacian(grad_fn, x_flat, forloop: bool):
    """Trace of the Hessian via jvp's of a (2, nd) real gradient function."""
    nd = x_flat.shape[0]
    eye = jnp.eye(nd, dtype=x_flat.dtype)
    if forloop:

        def body(i, val):
            _, tangent = jax.jvp(grad_fn, (x_flat,), (eye[i],))
            return val + tangent[0, i] + 1j * tangent[1, i]

        return jax.lax.fori_loop(0, nd, body, jnp.zeros((), _cdtype(x_flat.dtype)))

    # Batched over all nd basis vectors at once: one big jvp fan-out.
    def col(v):
        _, tangent = jax.jvp(grad_fn, (x_flat,), (v,))
        return (tangent * v).sum(axis=-1)  # (2,)

    diag = jax.vmap(col, in_axes=1, out_axes=1)(eye).sum(axis=-1)
    return diag[0] + 1j * diag[1]


def _cdtype(rdtype):
    return jnp.complex128 if rdtype == jnp.float64 else jnp.complex64


def make_logpsi_grad_laplacian(
    logpsi, forloop: bool = False, hutchinson: bool = False, logphi=None, logjacdet=None
):
    """Build the batched (logpsi, grad, laplacian) evaluators.

    Returns:
      logpsi_vmapped(x, params, state_indices) -> (batch,) complex,
      logpsi_grad_laplacian(x, params, state_indices, key)
          -> grad (batch, n, dim) complex, laplacian (batch,) complex.

    ``forloop`` selects the sequential Hessian-column loop (less memory);
    the default evaluates all columns as one batched jvp (TPU-friendly).
    With ``hutchinson`` the Laplacian is the stochastic v^T H v estimate; if
    ``logphi``/``logjacdet`` are given, only the Jacobian-determinant part is
    estimated and the Slater part is exact (production config).
    """

    @partial(jax.vmap, in_axes=(0, None, 0), out_axes=0)
    def logpsi_vmapped(x, params, state_idx):
        lp = logpsi(x, params, state_idx)
        return lp[0] + 1j * lp[1]

    @partial(jax.vmap, in_axes=(0, None, 0, None), out_axes=0)
    def exact_grad_laplacian(x, params, state_idx, key):
        grad = jax.jacrev(logpsi)(x, params, state_idx)
        grad = grad[0] + 1j * grad[1]

        n, dim = x.shape
        grad_fn = jax.jacrev(lambda xf: logpsi(xf.reshape(n, dim), params, state_idx))
        laplacian = _exact_laplacian(grad_fn, x.reshape(-1), forloop)
        return grad, laplacian

    def hutchinson_grad_laplacian(x, params, state_indices, key):
        v = jax.random.normal(key, x.shape, x.dtype)

        @partial(jax.vmap, in_axes=(0, None, 0, 0), out_axes=0)
        def full_hutchinson(x, params, state_idx, v):
            """v^T H v on the full logpsi (when no split is provided)."""
            grad, hvp = jax.jvp(jax.jacrev(lambda x: logpsi(x, params, state_idx)), (x,), (v,))
            grad = grad[0] + 1j * grad[1]
            lap = (hvp * v).sum(axis=(-2, -1))
            return grad, lap[0] + 1j * lap[1]

        @partial(jax.vmap, in_axes=(0, None, 0, 0), out_axes=0)
        def split_hutchinson(x, params, state_idx, v):
            """Exact Laplacian of the Slater term + v^T H v of 1/2 logjacdet."""
            grad_logphi = jax.jacrev(logphi)(x, params, state_idx)
            grad_logphi = grad_logphi[0] + 1j * grad_logphi[1]
            grad_ljd, hvp = jax.jvp(jax.grad(lambda x: logjacdet(x, params)), (x,), (v,))
            grad = grad_logphi + grad_ljd

            n, dim = x.shape
            grad_fn = jax.jacrev(lambda xf: logphi(xf.reshape(n, dim), params, state_idx))
            lap_logphi = _exact_laplacian(grad_fn, x.reshape(-1), forloop)
            random_ljd = (hvp * v).sum(axis=(-2, -1))
            return grad, lap_logphi + random_ljd

        fn = full_hutchinson if (logphi is None and logjacdet is None) else split_hutchinson
        return fn(x, params, state_indices, v)

    return logpsi_vmapped, (hutchinson_grad_laplacian if hutchinson else exact_grad_laplacian)


def make_logp(logpsi):
    """Coordinate density log p = 2 Re log Psi, batched."""

    @partial(jax.vmap, in_axes=(0, None, 0), out_axes=0)
    def logp(x, params, state_idx):
        return 2 * logpsi(x, params, state_idx)[0]

    return logp


def make_quantum_score(logpsi):
    """Per-sample d log Psi / d flow-params (complex), for the quantum Fisher."""

    @partial(jax.vmap, in_axes=(0, None, 0), out_axes=0)
    def quantum_score_fn(x, params, state_idx):
        grad_params = jax.jacrev(logpsi, argnums=1)(x, params, state_idx)
        return jax.tree.map(lambda jac: jac[0] + 1j * jac[1], grad_params)

    return quantum_score_fn
