"""Fast MCMC coordinate density: logp = 2 Re log Psi without slogdet.

The Metropolis kernel evaluates logp for the full walker batch at every
sweep (50x per training step — reference hot loop #2, src/MCMC.py:22-37 +
src/logpsi.py:22-29), and needs no parameter derivatives there.  This module
assembles logp from batched Gram-Cholesky log-determinants (ops/logdet.py)
instead of the generic make_logp path (wavefunction/logpsi.py), which runs
two XLA LU slogdets per walker:

    2 Re log Psi = 2 Re log det D(u) + log |det J|
                 = log det (D^H D)   + 1/2 log det (J^T J)
      with u = flow(x), J = d flow / dx, D_ij = L^(-dim/2) e^{i k_j . u_i}.

For dim=2 both Gram forms are (2n x 2n) real SPD — the complex Hermitian
D^H D via its real embedding — so the two determinants of the whole batch
ride a single Pallas kernel call.  The flow Jacobian is the ANALYTIC
pair-local propagation (models/ferminet_jac.py): O(n^2 * features) per
walker instead of the O(n^3)-FLOP / O(n^3)-memory nd-tangent fan-out of
generic forward-mode AD.

Differentially tested against make_logp (slogdet) in f64 and f32
(tests/test_fast_logp.py); the production MCMC path uses this function, the
AD paths (gradients/Laplacian/scores) are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.logdet import chol_logdet, gram_logabsdet, planewave_gram_embed

__all__ = ["make_logp_fast"]

_WARNED: set[str] = set()


def _warn_once(msg: str) -> None:
    """One-time (per process, per message) notice that an explicitly
    requested Pallas flow kernel is NOT engaged, so a user or A/B bench
    never silently measures the fallback path (advisor round 3)."""
    if msg not in _WARNED:
        _WARNED.add(msg)
        import warnings

        warnings.warn(msg, stacklevel=3)


def make_logp_fast(
    flow_apply,
    sp_indices,
    L,
    use_pallas: bool | None = None,
    chunk: int | None = None,
    jacobian=None,
    use_fused: bool | None = None,
    fused_interpret: bool = False,
    pallas_flow_cfg=None,
    use_large_flow: bool = False,
    use_d2_flow: bool = False,
):
    """Batched logp(x, params, state_indices) -> (batch,) = 2 Re log Psi.

    Drop-in replacement for ``make_logp(make_logpsi(...))`` on the sampling
    path.  ``sp_indices`` is the (M, dim) float array of twisted momenta.

    ``jacobian(params, x) -> (z, J (nd, nd))`` supplies the flow value and
    coordinate Jacobian for one sample; defaults to generic forward-mode AD
    of ``flow_apply``.  The production driver passes the analytic
    ``ferminet_apply_and_jac``.  ``chunk`` bounds HBM by processing the
    batch in pieces through a ``lax.map`` (one executable, sequential
    chunks) — required at large n with the AD fallback, whose tangent
    fan-out materializes O(batch * n^2 * nd) pair-feature tangents.
    """
    sp_indices = np.asarray(sp_indices)  # host constant

    def _fused_ok(x):
        from ..ops.pallas_fused_logp import fused_fits

        if use_fused is not None:  # explicit override wins over interpret
            if use_fused and jax.default_backend() != "tpu" and not fused_interpret:
                raise ValueError(
                    "use_fused=True requires the TPU backend (Pallas/Mosaic "
                    "kernels do not lower on %r); pass fused_interpret=True "
                    "to emulate on CPU" % jax.default_backend()
                )
            return use_fused
        if fused_interpret:
            return True
        return (
            jax.default_backend() == "tpu"
            and x.dtype == jnp.float32
            and fused_fits(x.shape[1], x.shape[2])
        )

    def logp_impl(x, params, state_indices):
        B, n, dim = x.shape
        nd = n * dim
        rdtype = x.dtype

        fused = pallas_flow_cfg is not None and _fused_ok(x)
        if (use_d2_flow or use_large_flow) and not fused:
            _warn_once(
                "use_d2_flow/use_large_flow requested but the fused Pallas "
                "path is not available (backend=%s, dtype=%s%s); MCMC logp "
                "falls back to the XLA flow path"
                % (jax.default_backend(), x.dtype,
                   "" if pallas_flow_cfg is not None else ", no flow cfg"))
        if fused:
            # all-Pallas path: batch-in-lanes flow fwd+jac kernel(s) feeding
            # the fused log-det tail in its native batch-last layout — the
            # whole Metropolis logp is back-to-back kernels with no XLA
            # tensor shuffling.  n <= 32 runs the whole network in one
            # kernel; larger n uses the row-chunked per-layer kernels
            # (depth-2 flows).
            from ..ops.pallas_flow_jac import (
                MAX_FLOW_N, MAX_FLOW_N_D2, MAX_FLOW_N_LARGE,
                flow_u_jac_pallas, flow_u_jac_pallas_d2,
                flow_u_jac_pallas_large,
            )
            from ..ops.pallas_fused_logp import fused_logp_pallas

            flow_kernel = None
            if n <= MAX_FLOW_N:
                flow_kernel = flow_u_jac_pallas
            # measured negative result (PERF.md): at n=49 the row-chunked
            # per-layer kernels + inter-kernel glue are ~17% SLOWER than
            # XLA's fused fwd+jac (the Jacobian state movement is the wall
            # for either path), so this stays opt-in via ``use_large_flow``.
            if use_large_flow and n <= MAX_FLOW_N_LARGE and pallas_flow_cfg.depth == 2:
                flow_kernel = flow_u_jac_pallas_large
            # depth-2 structured-closure kernel: no carried Jacobian state at
            # all (the wall both paths above pay at n >= 49); explicit opt-in
            # until the chip A/B (scripts/bench_flow_jac_ab.py) flips it.
            # Precedence when both flags are set: d2 wins over large.
            if use_d2_flow and n <= MAX_FLOW_N_D2 and pallas_flow_cfg.depth == 2:
                flow_kernel = flow_u_jac_pallas_d2
            if use_d2_flow and flow_kernel is not flow_u_jac_pallas_d2:
                _warn_once(
                    "use_d2_flow requested but the d2 Pallas kernel is not "
                    "engaged (n=%d > %d or depth=%d != 2); MCMC logp falls "
                    "back to %s" % (n, MAX_FLOW_N_D2, pallas_flow_cfg.depth,
                                    "the large-flow kernel" if flow_kernel
                                    is flow_u_jac_pallas_large else
                                    "the XLA flow path"))
            if use_large_flow and not use_d2_flow and \
                    flow_kernel is not flow_u_jac_pallas_large:
                _warn_once(
                    "use_large_flow requested but the large-n Pallas kernel "
                    "is not engaged (n=%d > %d or depth=%d != 2)"
                    % (n, MAX_FLOW_N_LARGE, pallas_flow_cfg.depth))
            if flow_kernel is not None:
                u_t, J_t = flow_kernel(
                    params, pallas_flow_cfg, x, interpret=fused_interpret
                )
                kt = jnp.moveaxis(
                    2 * jnp.pi / L * jnp.asarray(sp_indices, rdtype)[state_indices],
                    0, -1,
                )
                return fused_logp_pallas(
                    u_t, kt, J_t, L, batch_last=True, interpret=fused_interpret
                )

        def u_and_jac(xx):
            if jacobian is not None:
                return jacobian(params, xx)
            flow_flat = lambda q: flow_apply(params, q.reshape(n, dim)).reshape(-1)
            u_flat, jvp = jax.linearize(flow_flat, xx.reshape(-1))
            J = jax.vmap(jvp, in_axes=1, out_axes=1)(jnp.eye(nd, dtype=rdtype))
            return u_flat.reshape(n, dim), J

        u, J = jax.vmap(u_and_jac)(x)

        k = 2 * jnp.pi / L * jnp.asarray(sp_indices, rdtype)[state_indices]
        if _fused_ok(x):
            # one Pallas kernel for the whole tail: D build + both Grams +
            # complex/real Cholesky log-dets (ops/pallas_fused_logp.py)
            from ..ops.pallas_fused_logp import fused_logp_pallas

            return fused_logp_pallas(u, k, J, L, interpret=fused_interpret)
        ang = jnp.einsum("bnd,bmd->bnm", u, k)
        c = L ** (-dim / 2)
        Dr, Di = c * jnp.cos(ang), c * jnp.sin(ang)

        embed = planewave_gram_embed(Dr, Di)  # (B, 2n, 2n) SPD
        if 2 * n == nd:
            # dim=2: flow-Jacobian Gram is the same size — one kernel call.
            gram_J = jnp.einsum("bij,bkj->bik", J, J)
            ld = chol_logdet(
                jnp.concatenate([embed, gram_J], axis=0), use_pallas=use_pallas
            )
            return 0.5 * ld[:B] + 0.5 * ld[B:]
        return 0.5 * chol_logdet(embed, use_pallas=use_pallas) + gram_logabsdet(
            J, use_pallas=use_pallas
        )

    def logp(x, params, state_indices):
        B = x.shape[0]
        if chunk is None or B <= chunk:
            return logp_impl(x, params, state_indices)
        assert B % chunk == 0, (B, chunk)
        xc = x.reshape(B // chunk, chunk, *x.shape[1:])
        sic = state_indices.reshape(B // chunk, chunk, *state_indices.shape[1:])
        out = jax.lax.map(lambda args: logp_impl(args[0], params, args[1]), (xc, sic))
        return out.reshape(B)

    return logp
