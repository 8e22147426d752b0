"""Host-side float64 SR apply step.

TPUs have no native f64 path (emulated f64 inside the update graph crashes
the XLA TPU compiler at production sizes, and global x64 flips default dtypes
across the stack — see config.py), so the float64 option for the SR linear
algebra lives on the HOST: the accumulated Fisher matrices, gradients and
mean scores are pulled back once per apply step, the baseline correction,
quantum-Fisher centering, damped Cholesky solves and trust-region scaling all
run in numpy/LAPACK float64, and only the raveled parameter updates return to
the device.  Numerics mirror the reference apply step exactly
(reference main.py:291-307 + src/sr.py:86-120), at f64 instead of f32.

Cost model (single TPU v5e behind the axon tunnel, measured): the classical
Fisher at n=29 is 5826^2 f32 = 135 MB -> ~2.2 s device-to-host at ~60 MB/s,
plus ~2.3 s host Cholesky — ~5 s per apply step on top of a ~1.5 s epoch.
Use when f32 solve precision is the binding constraint (large-n stage-1
plateaus, PARITY.md); the on-device 'refined' solver covers the rest.
"""

from __future__ import annotations

import functools

import numpy as np
import scipy.linalg as sla

__all__ = ["host_solve_scaled", "host_hybrid_apply", "ravel_host",
           "sym_pack", "sym_unpack", "damped_upper", "HostFisherCache"]


@functools.lru_cache(maxsize=16)
def _triu_flat_indices(P):
    """Flat (row-major) indices of the upper triangle of a (P, P) matrix,
    computed once per P — sym_pack can be called eagerly every epoch
    (pretrain's grads_and_fisher), so the O(P^2) index build is cached."""
    iu = np.triu_indices(P)
    return iu[0] * P + iu[1]


def sym_pack(M):
    """Device-side: upper triangle (incl. diagonal) of a (P, P) symmetric
    matrix as a flat vector — halves the device->host transfer of the Fisher
    matrices, the dominant host64 cost on a slow link (see module docstring).
    Jit-traceable (pure jnp); inverted on host by :func:`sym_unpack`.
    """
    import jax.numpy as jnp  # this module is otherwise host-only (numpy/LAPACK)

    P = M.shape[-1]
    flat = jnp.reshape(M, M.shape[:-2] + (P * P,))
    return jnp.take(flat, _triu_flat_indices(P), axis=-1)


def _packed_dim(m):
    P = int(round((np.sqrt(8.0 * m + 1.0) - 1.0) / 2.0))
    assert P * (P + 1) // 2 == m, "not a packed triangle length: %d" % m
    return P


@functools.lru_cache(maxsize=4)
def _triu_indices(P):
    """Cached np.triu_indices(P): the two int64 index arrays are 136 MB each
    at n=29 (P=5826) — rebuilt per unpack they dominate the unpack cost."""
    return np.triu_indices(P)


def sym_unpack(v, dtype=np.float64):
    """Host-side inverse of :func:`sym_pack`: rebuild the full symmetric
    (P, P) matrix from its packed upper triangle.

    The dtype conversion runs as a separate vectorized ``ascontiguousarray``
    BEFORE the fancy scatter (a converting fancy assignment leaves numpy's
    fast memcpy-ish path), and the index arrays are cached per P."""
    v = np.ascontiguousarray(v, dtype)
    P = _packed_dim(v.shape[-1])
    M = np.empty(v.shape[:-1] + (P, P), dtype)
    iu = _triu_indices(P)
    M[..., iu[0], iu[1]] = v
    M[..., iu[1], iu[0]] = v
    return M


def damped_upper(v, divisor, damping, dtype=np.float64):
    """Packed triangle -> damped UPPER-triangular matrix for a Cholesky.

    Builds (M/divisor + damping·I) with the lower triangle left
    uninitialized: LAPACK's upper dpotrf (``cho_factor(..., lower=False)``,
    scipy's default) never reads it, so the symmetric mirror scatter and the
    full ``damping * eye(P)`` temporary — 271 MB each at n=29, pure memory
    traffic — are skipped, and the damping lands on the diagonal in O(P).
    Elementwise math (f64 convert, true divide, +) matches
    sym_unpack(v)/divisor + damping*eye exactly, so solves through this
    path are bitwise-identical to the full-matrix path."""
    v = np.ascontiguousarray(v, dtype)
    if divisor != 1:
        v = v / dtype(divisor)
    P = _packed_dim(v.shape[-1])
    M = np.empty((P, P), dtype)
    iu = _triu_indices(P)
    M[iu[0], iu[1]] = v
    M[np.diag_indices(P)] += damping
    return M


def ravel_host(tree):
    """Ravel a pytree of (numpy) leaves into one f64 vector.

    Leaf order matches jax.flatten_util.ravel_pytree (both use tree_flatten),
    so the device-side ``unravel`` closures invert this exactly.
    """
    import jax

    leaves = jax.tree.leaves(tree)
    return np.concatenate([np.asarray(l, np.float64).ravel() for l in leaves])


def host_solve_scaled(fisher, grads, damping, max_norm):
    """f64 damped solve + trust-region scaling; returns (-scaled step, diag).

    Same semantics as optim.sr._solve_scaled: a non-positive or non-finite
    curvature g^T M^{-1} g means the solve is untrustworthy -> null step.
    """
    A = np.array(fisher, dtype=np.float64)  # owned copy: damped + factored in place
    A[np.diag_indices(A.shape[0])] += damping
    g = np.asarray(grads, np.float64)
    try:
        c = sla.cho_factor(A, check_finite=False, overwrite_a=True)
        upd = sla.cho_solve(c, g, check_finite=False)
    except Exception:
        # centered quantum Fisher can be (numerically) indefinite; rebuild
        # the damped matrix — the failed in-place factorization clobbered it
        A = np.array(fisher, dtype=np.float64)
        A[np.diag_indices(A.shape[0])] += damping
        upd = sla.solve(A, g, check_finite=False)
    return _scale_step(upd, g, max_norm)


class HostFisherCache:
    """k-epoch stale-Fisher state for ``--sr_solver host64 --fisher_refresh K``.

    The host64 apply's dominant cost on a slow tunnel is the per-epoch
    device->host pull of the two Fisher matrices (the packed classical block
    alone is ~68 MB at n=29; measured 37 s/epoch on a bad-link day, ~3 s
    steady at 25 MB/s).  The Fisher is an 8192-sample Monte-Carlo estimate
    that changes slowly relative to its own sampling noise, so — exactly as
    KFAC refreshes its preconditioner every N steps — the metric can be
    refreshed every K epochs while the gradients, scores and trust-region
    logic stay per-epoch and all solve math stays f64 on host:

      * refresh epochs: pull both packed Fishers, Cholesky-factor the damped
        classical block once, keep the raw quantum block;
      * every epoch: pull the small leaves (grads, mean scores, observables
        — ~60 KB) PLUS the packed quantum Fisher (P_flow^2/2 ~ 2 MB at
        n=29 — small enough to ship fresh), baseline-correct in f64, solve
        the classical system via the cached factorization, and solve the
        FRESH quantum block centered with the current mean score.

    Only the classical block is amortized: its cached factor is of
    (F + damping·I), SPD by construction, so a stale classical solve can
    never zero-step.  A FROZEN quantum second moment, by contrast, goes
    indefinite against the moving current mean score (the centering is a
    subtraction of the CURRENT rank-1 outer product) — in production that
    zero-stepped and forced a full classical refetch nearly every
    early-training epoch, i.e. the cache degenerated to fisher_refresh=1
    plus overhead (round-5 timing forensics: host_solve 11.5 s/epoch).
    The frozen-quantum path is kept only for accumulators that don't carry
    a per-epoch 'quantum_fisher' (host_hybrid_apply fallback).

    Staleness bias: none at fixed points (an SR step is zero iff the
    gradient is zero for ANY positive-definite metric); between refreshes
    the update uses a metric at most K epochs old, well inside the metric's
    own MC noise for K ~ 16.  K=1 reproduces plain host64 exactly.
    """

    def __init__(self, damping):
        self.damping = float(damping)
        self._c_factor = None   # cho_factor of (classical Fisher + damping I)
        self._qf = None         # stale UNCENTERED quantum Fisher (f64)
        self.age = 0            # epochs since the last refresh

    @property
    def ready(self):
        return self._c_factor is not None

    def refresh(self, classical_fisher, quantum_fisher, divisor=1):
        """Install fresh Fisher blocks (raw acc_steps-sums with ``divisor`` =
        acc_steps, or already-normalized matrices with the default).

        A packed (1-D) classical block goes through :func:`damped_upper` —
        upper-triangle-only build, in-place dpotrf — the cheap path the
        production host64 apply ships."""
        cf = np.asarray(classical_fisher)
        if cf.ndim == 1:
            M = damped_upper(cf, divisor, self.damping)
        else:
            M = np.array(cf, np.float64)
            if divisor != 1:
                M /= np.float64(divisor)
            M[np.diag_indices(M.shape[0])] += self.damping
        # factor in place: M is a local temporary
        self._c_factor = sla.cho_factor(M, lower=False, check_finite=False,
                                        overwrite_a=True)
        qf = np.asarray(quantum_fisher)
        qf = sym_unpack(qf) if qf.ndim == 1 else np.array(qf, np.float64)
        if divisor != 1:
            qf /= np.float64(divisor)
        self._qf = qf
        self.age = 0

    def solve_classical(self, grads, max_norm):
        """f64 solve via the cached factorization + trust-region scaling."""
        g = np.asarray(grads, np.float64)
        upd = sla.cho_solve(self._c_factor, g, check_finite=False)
        return _scale_step(upd, g, max_norm)

    def solve_quantum(self, grads, qsm, max_norm):
        """Center the stale quantum Fisher with the CURRENT mean score, solve.

        Identical math to the direct path (host_hybrid_apply) with the
        Fisher's second-moment term frozen at the last refresh.
        """
        qf = self._qf - np.real(np.conj(qsm)[:, None] * qsm[None, :])
        qf += self.damping * np.eye(qf.shape[0])
        g = np.asarray(grads, np.float64)
        try:
            c = sla.cho_factor(qf, check_finite=False, overwrite_a=True)
            upd = sla.cho_solve(c, g, check_finite=False)
        except Exception:
            # centered quantum Fisher can be (numerically) indefinite;
            # rebuild — the failed in-place factorization clobbered qf
            qf = self._qf - np.real(np.conj(qsm)[:, None] * qsm[None, :])
            upd = sla.solve(qf + self.damping * np.eye(qf.shape[0]), g,
                            check_finite=False)
        return _scale_step(upd, g, max_norm)


def _scale_step(upd, g, max_norm):
    """Shared trust-region scaling + zero-step guard (see host_solve_scaled)."""
    gnorm = float(g @ upd)
    if not np.isfinite(gnorm) or gnorm <= 0.0:
        return np.zeros_like(upd), {"gnorm": gnorm, "scale": 0.0}
    scale = min(float(np.sqrt(max_norm / gnorm)), 1.0)
    upd = -scale * upd
    upd[~np.isfinite(upd)] = 0.0
    return upd, {"gnorm": gnorm, "scale": scale}


def host_hybrid_apply(acc_host, acc_steps, damping, max_norm, cache=None):
    """Full hybrid-SR apply math in f64 from the host copy of the accumulators.

    With ``cache`` (a :class:`HostFisherCache`), the Fisher blocks come from
    the cache instead of ``acc_host``; if ``acc_host`` carries
    'classical_fisher'/'quantum_fisher' entries the cache is refreshed from
    them first (this is a refresh epoch).  Everything else — baseline
    correction, trust-region scaling, diagnostics — is identical.

    ``acc_host``: pytree with the same structure train.init_accumulators
    builds ('data', 'grads', 'classical_score', 'quantum_score',
    'classical_fisher', 'quantum_fisher', 'quantum_score_mean'), each entry a
    SUM over acc_steps accumulation steps.  Leaves may be numpy arrays OR
    still-on-device jax arrays whose host copies were started with
    ``copy_to_host_async`` (main.py host64_apply_step): each ``np.asarray``
    below blocks only on its own leaf, so on the production path the quantum
    Fisher's device->host transfer streams (DMA, no GIL) WHILE LAPACK runs
    the classical solve — the fetch order here is the pipeline schedule.

    Returns (upd_van_raveled, upd_flow_raveled, data, diag) — updates as f64
    numpy vectors for the device-side unravel+apply, ``data`` the normalized
    observable dict (python floats), ``diag`` the two solves' diagnostics.
    """
    data = {k: float(v) / acc_steps for k, v in acc_host["data"].items()}

    grad_van = ravel_host(acc_host["grads"][0]) / acc_steps
    grad_flow = ravel_host(acc_host["grads"][1]) / acc_steps
    score_van = ravel_host(acc_host["classical_score"]) / acc_steps
    score_flow = ravel_host(acc_host["quantum_score"]) / acc_steps

    # REINFORCE baseline correction (reference main.py:295-298) in f64.
    grad_van = grad_van - data["F_mean"] * score_van
    grad_flow = grad_flow - data["E_mean"] * score_flow

    qsm2 = np.asarray(acc_host["quantum_score_mean"], np.float64) / acc_steps
    qsm = qsm2[0] + 1j * qsm2[1]

    if cache is not None:
        if "classical_fisher" in acc_host:  # refresh epoch
            cache.refresh(acc_host["classical_fisher"],
                          acc_host["quantum_fisher"], divisor=acc_steps)
            upd_flow, diag_flow = cache.solve_quantum(grad_flow, qsm, max_norm)
        else:
            cache.age += 1
            if "quantum_fisher" in acc_host:
                # Fresh quantum block on a stale-classical epoch — the
                # production host64 path (main.py).  Only the classical Fisher
                # is big enough to amortize (P_van^2, ~68 MB packed at n=29);
                # the quantum block (P_flow^2, ~2 MB packed) ships every epoch,
                # so its centering against the CURRENT mean score is exact and
                # can never go indefinite from staleness.  The frozen-quantum
                # fallback below caused a zero-step + full classical refetch
                # nearly every early-training epoch (round-5 timing forensics:
                # host_solve 11.5 s/epoch), defeating the cache entirely.
                qf = np.asarray(acc_host["quantum_fisher"], np.float64)
                qf = (sym_unpack(qf) if qf.ndim == 1 else qf) / acc_steps
                qf = qf - np.real(np.conj(qsm)[:, None] * qsm[None, :])
                upd_flow, diag_flow = host_solve_scaled(
                    qf, grad_flow, damping, max_norm)
            else:
                upd_flow, diag_flow = cache.solve_quantum(grad_flow, qsm, max_norm)
        upd_van, diag_van = cache.solve_classical(grad_van, max_norm)
        diag = {"gnorm_van": diag_van["gnorm"], "scale_van": diag_van["scale"],
                "gnorm_flow": diag_flow["gnorm"], "scale_flow": diag_flow["scale"]}
        return upd_van, upd_flow, data, diag

    # ---- classical block: fetch, unpack, solve (quantum Fisher in flight) --
    cf = np.asarray(acc_host["classical_fisher"])
    if cf.ndim == 1:  # packed upper triangle (sym_pack on device)
        # upper-only damped build + in-place upper dpotrf (damped_upper):
        # skips the mirror scatter and the damping*eye temporary; bitwise-
        # identical solves to the full-matrix path below
        M = damped_upper(cf, acc_steps, damping)
        try:
            c = sla.cho_factor(M, lower=False, check_finite=False,
                               overwrite_a=True)
            upd = sla.cho_solve(c, np.asarray(grad_van, np.float64),
                                check_finite=False)
            upd_van, diag_van = _scale_step(upd, grad_van, max_norm)
        except Exception:
            # PSD + damping should never fail; rebuild full for the fallback
            upd_van, diag_van = host_solve_scaled(
                sym_unpack(cf) / acc_steps, grad_van, damping, max_norm)
        del M
    else:
        upd_van, diag_van = host_solve_scaled(
            np.asarray(cf, np.float64) / acc_steps, grad_van, damping, max_norm)
    del cf

    # ---- quantum block --------------------------------------------------
    qf = np.asarray(acc_host["quantum_fisher"], np.float64)
    if qf.ndim == 1:
        qf = sym_unpack(qf)
    qf = qf / acc_steps
    # Center the quantum Fisher: subtract the mean-score outer product.
    qf = qf - np.real(np.conj(qsm)[:, None] * qsm[None, :])
    upd_flow, diag_flow = host_solve_scaled(qf, grad_flow, damping, max_norm)
    diag = {"gnorm_van": diag_van["gnorm"], "scale_van": diag_van["scale"],
            "gnorm_flow": diag_flow["gnorm"], "scale_flow": diag_flow["scale"]}
    return upd_van, upd_flow, data, diag
