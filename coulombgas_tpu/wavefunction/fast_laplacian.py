"""Analytic gradient/Laplacian of the Slater part — the TPU fast path.

The generic engine (wavefunction/logpsi.py, mirroring reference
src/logpsi.py:86-106) evaluates the Laplacian of log phi with n*dim
forward-over-reverse AD passes, each containing an n x n complex
decomposition: O(n*dim * n^3) determinant work per sample.  Because the
plane-wave Slater matrix D_ij = c e^{i k_j . u_i} has row-local derivatives
(dD/du_{i,a} only touches row i), both derivative orders of log det D in u
close analytically over ONE matrix inverse:

    E^a   = (D ∘ K_a) D^{-1}                      (dim complex matmuls)
    d log phi / du_{i,a}        = i E^a_{ii}
    d^2 log phi / du_{ia} du_{lb} = -delta_{il} F^{ab}_{ii} + E^a_{il} E^b_{li}
    with F^{ab}_{ii} = [(D ∘ K_a K_b) D^{-1}]_{ii}

(K_a broadcasts k_{j,a} over rows).  Chain rule through the flow u(x):

    lap_x log phi = sum_mu (lap_x u)_mu g_mu + sum_{mu nu} C_{mu nu} H_{mu nu},
    C = J J^T,  J = du/dx,

where J and the flow coordinate Laplacian cost only flow forwards (no
determinants).  Total: O(dim * n^3) — n*dim/dim ~ n x less determinant work
than generic AD.  Correctness identity: at the identity flow the local
kinetic energy collapses to sum_j |k_j|^2 exactly (tested), and the whole
path is differentially tested against the generic engine.

No parameter-gradients are required through this path (the loss
differentiates log psi only; E_loc enters as a constant), so it is built
from plain linear algebra, not AD.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_logpsi_grad_laplacian_analytic"]


def _cdtype(rdtype):
    return jnp.complex128 if rdtype == jnp.float64 else jnp.complex64


def make_logpsi_grad_laplacian_analytic(
    flow_apply, sp_indices, L, hutchinson: bool = True, forloop: bool = False,
    flow_jac=None, flow_jac_lap=None, flow_jac_lap_batched=None,
):
    """Batched (grad, laplacian) of log Psi with the analytic Slater part.

    The 1/2 log|det J| flow-Jacobian term is handled like the reference's
    production path (src/logpsi.py:134-164): exact gradient, Hutchinson
    v^T H v estimate of its Laplacian (or the exact column loop with
    ``hutchinson=False``).

    ``flow_jac(params, x) -> (z, J (nd, nd))``, when given, supplies the
    analytic pair-local flow Jacobian (models/ferminet_jac.py): J comes
    without the nd-tangent fan-out, and log|det J| becomes the
    differentiable Gram-Cholesky 1/2 log det(J J^T) — its gradient and
    Hutchinson Hessian-vector product then contain no LU and no fan-out.
    ``flow_jac_lap(params, x) -> (z, J, lap_u (nd,))`` additionally supplies
    the analytic coordinate Laplacian of the flow, eliminating the last
    nd-wide fan-out (the jvp-of-jvp ``dir_second`` loop below) — the
    dominant accumulate-phase cost at large n.  It supersedes ``flow_jac``.
    ``flow_jac_lap_batched(params, x (B, n, dim)) -> (u (B, n, dim),
    J (B, nd, nd), lap_u (B, nd))`` replaces the PRIMAL flow evaluation for
    the whole batch with one call (e.g. the Pallas d2 kernel,
    ops/pallas_flow_jac.flow_u_jac_lap_pallas_d2) issued outside the
    per-walker vmap; the differentiable ``flow_jac``/``flow_jac_lap`` is
    still required for the Hutchinson log|det J| term, which runs under AD.

    Returns ``fn(x, params, state_indices, key) -> (grad, laplacian)`` with
    grad (batch, n, dim) complex and laplacian (batch,) complex — a drop-in
    replacement for the engines from make_logpsi_grad_laplacian.
    """
    sp_indices = np.asarray(sp_indices)  # host constant (see autoregressive.py)
    if flow_jac_lap is not None:
        flow_jac = lambda params, x: flow_jac_lap(params, x)[:2]
    if flow_jac is not None:
        from ..ops.logdet import logdet_spd_single

    def slater_grad_lap_u(k, u):
        """g (n,dim) and the Hessian pieces of log det D in flow space u."""
        n, dim = u.shape
        cdtype = _cdtype(u.dtype)
        k_dot_u = u @ k.T
        D = L ** (-dim / 2) * jnp.exp(1j * k_dot_u.astype(cdtype))
        # LU inverse on purpose: the Gram form squares cond(D) and loses all
        # f32 digits on near-node walkers (see models/slater.py).
        M = jnp.linalg.inv(D)

        # E^a = (D * k_{j,a}) M, stacked over a: (dim, n, n)
        DK = D[None, :, :] * k.T[:, None, :].astype(cdtype)  # (dim, n, j)
        E = jnp.einsum("aij,jl->ail", DK, M)
        g = 1j * jnp.einsum("aii->ia", E)  # (n, dim)

        # F^{ab}_{ii} = sum_j D_ij k_ja k_jb M_ji  -> (dim, dim, n)
        DMt = D * M.T  # (n, j)
        kk = jnp.einsum("ja,jb->abj", k, k).astype(cdtype)
        Fdiag = jnp.einsum("ij,abj->abi", DMt, kk)
        return g, E, Fdiag

    def grad_lap_one(x, params, state_idx, v, ujl=None):
        n, dim = x.shape
        nd = n * dim
        rdtype = x.dtype
        k = 2 * jnp.pi / L * jnp.asarray(sp_indices, rdtype)[state_idx]

        x_flat = x.reshape(-1)
        flow_flat = lambda xf: flow_apply(params, xf.reshape(n, dim)).reshape(-1)

        if ujl is not None:
            u, J, lap_u = ujl  # batched kernel's per-walker slice
        elif flow_jac_lap is not None:
            u, J, lap_u = flow_jac_lap(params, x)
        else:
            if flow_jac is not None:
                u, J = flow_jac(params, x)
            else:
                u_flat, J = jax.linearize(flow_flat, x_flat)
                J = jax.vmap(J, in_axes=1, out_axes=1)(jnp.eye(nd, dtype=rdtype))
                u = u_flat.reshape(n, dim)

            # flow coordinate Laplacian: sum_alpha d^2 u_mu / dx_alpha^2
            def dir_second(e):
                f_e = lambda xf: jax.jvp(flow_flat, (xf,), (e,))[1]
                return jax.jvp(f_e, (x_flat,), (e,))[1]

            lap_u = jax.vmap(dir_second, in_axes=1, out_axes=1)(
                jnp.eye(nd, dtype=rdtype)
            ).sum(axis=1)

        g, E, Fdiag = slater_grad_lap_u(k, u)
        g_flat = g.reshape(-1)

        # gradient in x: J^T g  (J real, g complex)
        grad_logphi = (J.real.T @ g_flat.real) + 1j * (J.real.T @ g_flat.imag)
        grad_logphi = grad_logphi.reshape(n, dim)

        # Hessian contraction with C = J J^T
        C = (J @ J.T).reshape(n, dim, n, dim)
        cdtype = _cdtype(rdtype)
        Cc = C.astype(cdtype)
        term2 = jnp.einsum("ail,bli,ialb->", E, E, Cc)
        Cdiag = jnp.einsum("iaib->abi", C).astype(cdtype)
        term1 = -jnp.einsum("abi,abi->", Fdiag, Cdiag)
        lap_logphi = (lap_u.astype(cdtype) @ g_flat) + term1 + term2

        # ---- 1/2 log|det J| term -------------------------------------------
        def logjacdet(xf):
            if flow_jac is not None:
                _, Jl = flow_jac(params, xf.reshape(n, dim))
                return 0.25 * logdet_spd_single(Jl @ Jl.T)
            jac = jax.jacfwd(flow_flat)(xf)
            return 0.5 * jnp.linalg.slogdet(jac)[1]

        if hutchinson:
            grad_ljd, hvp = jax.jvp(jax.grad(logjacdet), (x_flat,), (v.reshape(-1),))
            lap_ljd = (hvp * v.reshape(-1)).sum()
        else:
            grad_fn = jax.grad(logjacdet)
            grad_ljd = grad_fn(x_flat)
            if forloop:
                eye = jnp.eye(nd, dtype=rdtype)

                def body(i, val):
                    _, t = jax.jvp(grad_fn, (x_flat,), (eye[i],))
                    return val + t[i]

                lap_ljd = jax.lax.fori_loop(0, nd, body, jnp.zeros((), rdtype))
            else:
                eye = jnp.eye(nd, dtype=rdtype)

                def col(e):
                    _, t = jax.jvp(grad_fn, (x_flat,), (e,))
                    return (t * e).sum()

                lap_ljd = jax.vmap(col, in_axes=1)(eye).sum()

        grad = grad_logphi + grad_ljd.reshape(n, dim)
        laplacian = lap_logphi + lap_ljd
        return grad, laplacian

    def logpsi_grad_laplacian(x, params, state_indices, key):
        v = jax.random.normal(key, x.shape, x.dtype)
        if flow_jac_lap_batched is not None:
            ujl = flow_jac_lap_batched(params, x)  # one launch for the batch
            return jax.vmap(
                grad_lap_one, in_axes=(0, None, 0, 0, (0, 0, 0)), out_axes=0
            )(x, params, state_indices, v, ujl)
        return jax.vmap(grad_lap_one, in_axes=(0, None, 0, 0), out_axes=0)(
            x, params, state_indices, v
        )

    return logpsi_grad_laplacian
