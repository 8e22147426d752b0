"""Stochastic reconfiguration (natural-gradient) optimizers.

Second-order updates from classical and quantum Fisher information matrices.
Capability parity with reference src/sr.py (fisher_sr, hybrid_fisher_sr) with
the same numerics (score outer products, mean-score centering of the quantum
Fisher, damping, dense solve, per-block trust-region scaling, negated update),
but a clean typed API: Fisher matrices flow through an explicit
``extra_args``/state argument instead of being smuggled through the optax
``params`` slot (the reference documents this abuse at src/sr.py:23-27,87-91).

TPU notes: the Fisher build is a (batch x P)^T (batch x P) GEMM — MXU work —
and the contraction over a mesh-sharded batch axis lowers to a psum
automatically under jit.  The dense P x P solves (P ~ 1e3-1e4) run on device;
on TPU they are f32 — validated against f64 in tests/test_f32.py
(test_sr_solve_f32_vs_f64, test_sr_solve_f32_indefinite_no_nan,
test_hybrid_fisher_f32_vs_f64).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

__all__ = ["fisher_sr", "hybrid_fisher_sr", "fishers_from_scores",
           "FisherSR", "HybridFisherSR"]


def _ravel_batch(scores):
    """Per-sample pytree scores -> (batch, P) matrix."""
    return jax.vmap(lambda tree: ravel_pytree(tree)[0])(scores)


def _solve_scaled(fisher, grads_raveled, damping, max_norm, refine: int = 0,
                  jacobi: bool = False, with_diag: bool = False,
                  chol: bool = False):
    """Damped dense solve + trust-region scaling; returns the *negated* step.

    The centered quantum Fisher is PSD only up to roundoff; in f32 the damped
    matrix can be numerically indefinite, so use a general LU solve (a
    Cholesky would silently produce NaNs).  The trust-region scale is
    ``min(sqrt(max_norm / g^T delta), 1)`` with delta = M^{-1} g; in exact
    arithmetic g^T delta > 0, so a non-positive (or non-finite) value means
    the f32 solve produced garbage curvature — in that case the step is
    ZEROED.  (Round-1 clamped the denominator to ``tiny`` instead, which sent
    scale -> 1 and applied the garbage step UNSCALED; forensics of the n=29
    interacting run show exactly such discrete catastrophic updates — K
    jumping 0.99 -> 2.54 in one epoch — seeding the entropy collapse.  See
    PARITY.md round 2.)  A final finiteness mask turns any remaining
    pathological solve into a null step instead of NaN parameters.

    f32 accuracy measures: ``jacobi`` solves (S M S) y = S g with
    S = diag(M)^(-1/2) — identical solution in exact arithmetic, far better
    f32 conditioning when the Fisher's diagonal spread dominates; ``refine``
    adds rounds of f32 iterative refinement with HIGHEST-precision residual
    matvecs.  With the trust-region guard above fixed these are safe to
    enable (round-1 instabilities attributed to "accurate solves" were
    garbage steps taken through the gnorm<=0 path).

    ACCURACY DOMAIN (round-5 forensics, scripts/probe_chol_leak.py +
    data/failed_r5_chol_extension/README.md): every f32 variant here is
    sound only while the damped system's condition number stays below
    ~1/eps_f32 ~ 1e7.  The n=29 production Fisher blocks have
    lambda_max/damping ~ 6e8, where the f32 Cholesky fails and the ``bad``
    fallback below silently boosts damping 33x — an over-damped natural
    gradient that leaks entropy at flat F.  For production SR at
    damping=1e-3 use ``--sr_solver host64`` (optionally with
    ``--fisher_refresh K`` to amortize the device->host Fisher pull); the
    on-device variants remain for small/well-conditioned problems and for
    backends without a host link.

    ``with_diag`` also returns {"gnorm", "scale"} so the driver can log when
    the guard fires.
    """
    dtype = fisher.dtype
    M = fisher + damping * jnp.eye(fisher.shape[0], dtype=dtype)
    if dtype == jnp.float64 or not (jacobi or refine or chol):
        updates = jax.scipy.linalg.solve(M, grads_raveled)
        gnorm = jnp.sum(grads_raveled * updates)
    else:
        s = jax.lax.rsqrt(jnp.diagonal(M)) if jacobi else jnp.ones_like(grads_raveled)
        Ms = M * s[:, None] * s[None, :]
        gs = grads_raveled * s
        hi = jax.lax.Precision.HIGHEST
        if chol:
            # SPD path: Cholesky avoids both LU's pivot machinery (which has
            # crashed the XLA TPU compiler at production P — see
            # data/parity_n49_refined.log) and half its FLOPs.  The damped
            # Fisher is SPD in exact arithmetic, but the CENTERED quantum
            # Fisher can be numerically indefinite in f32; a failed
            # factorization yields non-finite entries, in which case we
            # refactor once with boosted damping (on the Jacobi-scaled
            # system, whose diagonal is ~1).  Any still-pathological solve
            # falls through to the gnorm<=0 zero-step guard below.
            eye = jnp.eye(Ms.shape[0], dtype=dtype)
            c = jax.scipy.linalg.cholesky(Ms, lower=True)
            bad = ~jnp.all(jnp.isfinite(c))
            Ms_b = Ms + jnp.asarray(32.0 * damping, dtype) * eye
            c_b = jax.scipy.linalg.cholesky(Ms_b, lower=True)
            c = jnp.where(bad, c_b, c)
            Ms = jnp.where(bad, Ms_b, Ms)
            solve = lambda rhs: jax.scipy.linalg.cho_solve((c, True), rhs)
        else:
            lu_piv = jax.scipy.linalg.lu_factor(Ms)
            solve = lambda rhs: jax.scipy.linalg.lu_solve(lu_piv, rhs)
        y = solve(gs)
        for _ in range(refine):
            r = gs - jnp.dot(Ms, y, precision=hi)
            y = y + solve(r)
        updates = y * s
        gnorm = jnp.sum(grads_raveled * updates)
    ok = jnp.isfinite(gnorm) & (gnorm > 0)
    scale = jnp.where(
        ok,
        jnp.minimum(jnp.sqrt(max_norm / jnp.where(ok, gnorm, 1.0)), 1.0),
        0.0,
    )
    updates = -scale * updates
    updates = jnp.where(jnp.isfinite(updates), updates, jnp.zeros_like(updates))
    if with_diag:
        return updates, {"gnorm": gnorm, "scale": scale}
    return updates


class FisherSR(NamedTuple):
    """Classical-only SR (natural gradient); optax-like init/update pair."""

    init: Any
    update: Any


def fisher_sr(score_fn, damping, max_norm, refine: int = 0, jacobi: bool = False,
              chol: bool = False) -> FisherSR:
    """SR for the classical VAN alone (used by free-fermion pretraining).

    ``score_fn(params, state_indices)`` returns per-sample score pytrees.
    ``update(grads, state, params, state_indices)`` returns (updates, state);
    the state carries the trust-region diagnostics of the last solve.
    """

    def init_fn(params):
        return {"gnorm": jnp.zeros(()), "scale": jnp.zeros(())}

    def update_fn(grads, state, params, state_indices, max_norm_scale=1.0):
        # ``max_norm_scale``: dynamic trust-region escalation factor (the
        # tripwire shrinks it on persistent event bursts); a traced scalar so
        # the jitted update need not recompile when it changes.
        grads_raveled, unravel = ravel_pytree(grads)
        score = _ravel_batch(score_fn(params, state_indices))
        batch = score.shape[0]
        # Mean over the (sharded) global batch: psum under jit.
        fisher = score.T @ score / batch
        upd, diag = _solve_scaled(fisher, grads_raveled, damping,
                                  max_norm * max_norm_scale,
                                  refine=refine, jacobi=jacobi, chol=chol,
                                  with_diag=True)
        return unravel(upd), diag

    return FisherSR(init_fn, update_fn)


def fishers_from_scores(classical_score, quantum_score):
    """(S_c (B, P_c), S_q (B, P_q) complex) -> the hybrid-SR Fisher payload.

    Shared by ``hybrid_fisher_sr.fishers`` and the jacrev-free training step
    (train/train.py) so both assemble identical (classical_fisher,
    quantum_fisher, quantum_score_mean) — the mean is Re/Im-stacked as a
    real (2, P) array because complex arrays may not cross jit boundaries on
    all TPU runtimes (c64 program inputs / host fetches are unimplemented on
    the axon tunnel).
    """
    batch = classical_score.shape[0]
    classical_fisher = classical_score.T @ classical_score / batch
    quantum_fisher = (quantum_score.conj().T @ quantum_score).real / batch
    qsm = quantum_score.mean(axis=0)
    return classical_fisher, quantum_fisher, jnp.stack([qsm.real, qsm.imag])


class HybridFisherSR(NamedTuple):
    """Joint classical+quantum SR: scores/fishers builders + init/update."""

    fishers: Any
    init: Any
    update: Any
    scores: Any = None


def hybrid_fisher_sr(classical_score_fn, quantum_score_fn, damping, max_norm,
                     refine: int = 0, jacobi: bool = False,
                     chol: bool = False) -> HybridFisherSR:
    """Hybrid SR over (params_van, params_flow).

    ``scores(params_van, params_flow, state_indices, x)`` returns the raveled
    per-sample score matrices (S_c (B, P_van), S_q (B, P_flow) complex) —
    everything the SR step needs derives from these: the Fisher matrices, the
    mean scores, AND the REINFORCE gradients (grad = S^T w / B with w the
    clipped per-sample weights), which lets the training step skip its loss
    jacrevs entirely in SR mode.  ``fishers(...)`` returns
    (classical_fisher, quantum_fisher, quantum_score_mean), each a global
    batch average (accumulated across grad-accumulation steps by the driver).
    ``update(grads, state, fishers)`` consumes them explicitly.
    """

    def scores_fn(params_van, params_flow, state_indices, x):
        classical_score = _ravel_batch(classical_score_fn(params_van, state_indices))
        quantum_score = _ravel_batch(quantum_score_fn(x, params_flow, state_indices))
        return classical_score, quantum_score

    def fishers_fn(params_van, params_flow, state_indices, x):
        return fishers_from_scores(
            *scores_fn(params_van, params_flow, state_indices, x)
        )

    def init_fn(params):
        z = jnp.zeros(())
        return {"gnorm_van": z, "scale_van": z, "gnorm_flow": z, "scale_flow": z}

    def update_fn(grads, state, fishers, max_norm_scale=1.0):
        # ``max_norm_scale``: dynamic trust-region escalation factor (the
        # tripwire shrinks it on persistent event bursts); traced, so changing
        # it does not recompile the apply step.
        grad_van, grad_flow = grads
        classical_fisher, quantum_fisher, quantum_score_mean = fishers
        qsm = quantum_score_mean[0] + 1j * quantum_score_mean[1]
        # Center the quantum Fisher: subtract the mean-score outer product.
        quantum_fisher = quantum_fisher - (qsm.conj()[:, None] * qsm).real

        scaled_norm = max_norm * max_norm_scale
        gv, unravel_van = ravel_pytree(grad_van)
        gf, unravel_flow = ravel_pytree(grad_flow)
        upd_van, diag_van = _solve_scaled(classical_fisher, gv, damping, scaled_norm,
                                          refine=refine, jacobi=jacobi, chol=chol,
                                          with_diag=True)
        upd_flow, diag_flow = _solve_scaled(quantum_fisher, gf, damping, scaled_norm,
                                            refine=refine, jacobi=jacobi, chol=chol,
                                            with_diag=True)
        diag = {"gnorm_van": diag_van["gnorm"], "scale_van": diag_van["scale"],
                "gnorm_flow": diag_flow["gnorm"], "scale_flow": diag_flow["scale"]}
        return (unravel_van(upd_van), unravel_flow(upd_flow)), diag

    return HybridFisherSR(fishers_fn, init_fn, update_fn, scores_fn)
