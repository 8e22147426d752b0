"""Batched log-determinants of small SPD matrices, built for TPU.

Motivation (measured on TPU v5e, see scripts/profile_logp.py): the MCMC
coordinate density logp = 2 Re log Psi needs log|det J| of the flow Jacobian
and log|det D| of the plane-wave Slater matrix for every walker at every
Metropolis sweep.  XLA lowers ``jnp.linalg.slogdet`` to an LU custom call
whose batched-small-matrix path runs ~40x off the bandwidth roofline on this
platform (57 ms for (8192, 26, 26) f32), and its runtime is erratically
value-dependent.  Both determinants reduce to SPD Gram forms:

    log|det J|      = 1/2 log det (J^T J)
    2 Re log det D  =     log det (D^H D)     (and the real 2n x 2n embedding
                                               of a Hermitian PD matrix M has
                                               log det = 2 log det M)

so a single *pivot-free batched Cholesky* covers the hot path.  Cholesky
needs no pivoting (stability comes from positive-definiteness), which makes
it fully vectorizable across the batch: every elimination step is a masked
rank-1 update with no data-dependent control flow.

Two implementations with identical semantics:

  * ``chol_logdet_ref`` — pure jnp, unrolled over the (static, small) matrix
    dimension; works on any backend/dtype; the differential-test oracle.
  * ``ops.pallas_logdet.chol_logdet_pallas`` — a Pallas TPU kernel holding
    each batch block in VMEM across all elimination steps (one HBM read per
    matrix instead of one per step).

Near-singular handling: a pivot below ``PIVOT_FLOOR`` marks a (numerically)
singular matrix.  The step is deflated — the pivot contributes
``log(PIVOT_FLOOR)`` and its column is zeroed — so the result degrades to a
large negative value instead of NaN.  For the MCMC use case that is exactly
the right behavior: a walker proposal at a wavefunction node must be
rejected, which a strongly negative logp guarantees, while NaN would poison
the accept comparison and freeze the walker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "PIVOT_FLOOR",
    "chol_logdet_ref",
    "chol_logdet",
    "chol_logdet_single",
    "logdet_spd_single",
    "gj_inverse_single",
    "gram_inverse_single",
    "gram_logabsdet",
    "planewave_gram_embed",
]

# f32 min normal is ~1.2e-38; 1e-30 leaves headroom for the rank-1 updates.
PIVOT_FLOOR = 1e-30


def chol_logdet_ref(A):
    """log det A for a batch of SPD matrices, pivot-free Cholesky; pure jnp.

    A: (batch, m, m) symmetric positive definite.  Returns (batch,) log det.
    Deflates non-positive pivots (see module docstring).  The elimination is
    unrolled over the static matrix dimension with full-matrix masked
    updates, so it contains no LU custom call, no while loop and no gather —
    every step is a plain vectorized multiply-add over the batch.
    """
    m = A.shape[-1]
    dtype = A.dtype
    floor = jnp.asarray(PIVOT_FLOOR, dtype)
    log_floor = jnp.log(floor)
    ld = jnp.zeros(A.shape[0], dtype)
    rows = jnp.arange(m)
    for k in range(m):
        d = A[:, k, k]
        bad = d < floor
        d_use = jnp.where(bad, jnp.ones_like(d), d)
        ld = ld + jnp.where(bad, log_floor, jnp.log(d_use))
        col = A[:, :, k] / d_use[:, None]
        colm = jnp.where((rows > k)[None, :] & ~bad[:, None], col, 0.0)
        A = A - colm[:, :, None] * (colm[:, None, :] * d_use[:, None, None])
    return ld


def chol_logdet_single(A):
    """log det of ONE SPD matrix — the differentiable building block.

    Unlike slogdet (whose gradient rule routes through LU solves — the op
    family with pathological batched-small-matrix performance on this TPU,
    see module docstring), this is a chain of plain jnp ops, so any order of
    forward/reverse AD stays in vectorizable territory.  Used by the AD-path
    wavefunction assembly (make_logpsi_fast) under per-sample vmap.
    """
    return chol_logdet_ref(A[None])[0]


def gj_inverse_single(A):
    """Inverse of ONE symmetric/Hermitian positive-definite matrix.

    Unrolled no-pivot Gauss-Jordan elimination — positive definiteness makes
    every pivot (a Schur-complement diagonal) positive, so no pivot search is
    needed and every step is a plain vectorized multiply-add: no LU custom
    call enters the graph, which keeps this fast under per-sample ``vmap``
    on TPU (the batched-small-matrix LU path runs ~40x off roofline there,
    see module docstring) and forward/reverse differentiable to any order.
    Works for real symmetric and complex Hermitian A (the pivots of an HPD
    matrix are real; a vanishing pivot is floored like in ``chol_logdet``).
    """
    m = A.shape[-1]
    dtype = A.dtype
    rdtype = jnp.finfo(dtype).dtype  # real counterpart for the pivot guard
    floor = jnp.asarray(PIVOT_FLOOR, rdtype)
    M = jnp.eye(m, dtype=dtype)
    rows = jnp.arange(m)
    for k in range(m):
        d = A[k, k]
        d_re = d.real if jnp.iscomplexobj(A) else d
        d_use = jnp.where(d_re < floor, jnp.asarray(1.0, rdtype), d_re)
        rowA = A[k, :] / d_use
        rowM = M[k, :] / d_use
        c = jnp.where(rows == k, 0.0, A[:, k])[:, None]
        A = A - c * rowA[None, :]
        M = M - c * rowM[None, :]
        is_k = (rows == k)[:, None]
        A = jnp.where(is_k, rowA[None, :], A)
        M = jnp.where(is_k, rowM[None, :], M)
    return M


def gram_inverse_single(D):
    """D^{-1} of ONE square complex (or real) matrix via its Gram form.

    D^{-1} = (D^H D)^{-1} D^H with the Hermitian-PD Gram inverted by
    ``gj_inverse_single`` — no LU custom call, fully batchable under vmap.
    Conditioning is squared (like all Gram-form ops here); differentially
    tested against jnp.linalg.inv in tests/test_logdet.py.
    """
    Dh = D.conj().T if jnp.iscomplexobj(D) else D.T
    return gj_inverse_single(Dh @ D) @ Dh


@jax.custom_jvp
def logdet_spd_single(A):
    """log det of ONE SPD matrix with a closed-form derivative rule.

    Primal: the pivot-free Cholesky (``chol_logdet_single``).  Tangent:
    tr(A^{-1} dA) with the inverse from ``gj_inverse_single`` — generic AD
    would instead chain through all m unrolled elimination steps, saving
    every intermediate Schur complement as a residual (O(m) full-matrix
    residuals per sample); the closed form is one inverse and one
    contraction, and being a custom_jvp it transposes for reverse mode and
    nests for the forward-over-reverse Hessian paths (Hutchinson).
    """
    return chol_logdet_single(A)


@logdet_spd_single.defjvp
def _logdet_spd_jvp(primals, tangents):
    (A,), (dA,) = primals, tangents
    primal = chol_logdet_single(A)
    inv = gj_inverse_single(A)
    # A (and so inv) symmetric: tr(A^{-1} dA) = sum(inv * dA)
    return primal, jnp.sum(inv * dA)


def chol_logdet(A, use_pallas: bool | None = None, interpret: bool = False):
    """log det of batched SPD matrices; Pallas kernel on TPU, jnp elsewhere.

    ``use_pallas=None`` auto-selects: the kernel requires a TPU backend and
    f32 input.  ``interpret=True`` forces the kernel's interpreter mode (for
    CPU differential tests of the actual kernel).
    """
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and A.dtype == jnp.float32
        )
    if use_pallas or interpret:
        from .pallas_logdet import chol_logdet_pallas

        return chol_logdet_pallas(A, interpret=interpret)
    return chol_logdet_ref(A)


def gram_logabsdet(J, **kw):
    """log |det J| for a batch of square real matrices via the Gram form.

    Exact identity: log|det J| = 1/2 log det(J^T J).  Costs one batched
    (m, m) matmul (MXU) plus the Cholesky log-det; conditioning is squared,
    which for the near-identity flow Jacobians (and f32) is benign — the
    production path is differentially tested against slogdet.
    """
    A = jnp.einsum("bij,bkj->bik", J, J, precision=jax.lax.Precision.HIGHEST)
    return 0.5 * chol_logdet(A, **kw)


def planewave_gram_embed(Dr, Di):
    """Real 2n x 2n SPD embedding of H = D^H D for complex D = Dr + i Di.

    det(embed(H)) = det(H)^2 and log det H = 2 Re log det D + const-free, so

        2 Re log det D = log det H = 1/2 log det embed(H).

    Returns the (batch, 2n, 2n) embedded matrices; combine with
    ``chol_logdet`` at the call site (this keeps the 2n x 2n shape equal to
    the dim=2 flow-Jacobian Gram, so both determinants ride one kernel call).
    """
    hi = jax.lax.Precision.HIGHEST  # Gram entries are O(1) sums of n products;
    # bf16-pass matmuls would dominate the f32 error budget of the log-det
    Hr = jnp.einsum("bji,bjk->bik", Dr, Dr, precision=hi) + jnp.einsum(
        "bji,bjk->bik", Di, Di, precision=hi
    )
    Hi = jnp.einsum("bji,bjk->bik", Dr, Di, precision=hi) - jnp.einsum(
        "bji,bjk->bik", Di, Dr, precision=hi
    )
    top = jnp.concatenate([Hr, -Hi], axis=-1)
    bot = jnp.concatenate([Hi, Hr], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
