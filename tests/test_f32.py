"""f32/TPU numerics audit: the production dtype vs the f64 oracle, on CPU.

Production runs f32/c64 on TPU (config.py) while the reference is f64
everywhere; these tests quantify the f64->f32 error of exactly the delicate
pieces called out in SURVEY.md §7 (hard parts 1 and 5): the complex slogdet
phase at n=57, the Ewald g_0/g_k cancellation, the Fisher solves, and the
kinetic-energy cancellation -lap - (grad)^2.  Tolerances are pinned at
~5-10x the observed error so regressions (a lost digit) fail loudly.
"""

import jax
import jax.numpy as jnp
import numpy as np

import coulombgas_tpu as cg
from coulombgas_tpu.optim.sr import _solve_scaled
from coulombgas_tpu.wavefunction.fast_laplacian import make_logpsi_grad_laplacian_analytic
from coulombgas_tpu.wavefunction.logpsi import make_logpsi, make_logpsi_grad_laplacian


def _planewave(n, dim, Emax, dtype, seed=0, twist=0.25):
    L = float(np.sqrt(np.pi * n)) if dim == 2 else (4 / 3 * np.pi * n) ** (1 / 3)
    sp_indices, _ = cg.sp_orbitals(dim, Emax)
    sp, _ = cg.twist_sort(sp_indices, np.full(dim, twist))
    sp = np.asarray(sp[::-1].copy(), np.dtype(dtype).name)
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (n, dim), dtype, 0.0, L)
    return sp, x, L


def test_identity_flow_kinetic_f32():
    """Kinetic oracle in f32: exact eigenvalue up to f32 AD roundoff."""
    n, dim, batch = 13, 2, 16
    sp, _, L = _planewave(n, dim, 25, jnp.float32)
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (batch, n, dim), jnp.float32, 0.0, L)
    sidx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (batch, 1))

    logpsi = make_logpsi(lambda p, q: q, sp, L)
    _, grad_lap = make_logpsi_grad_laplacian(logpsi)
    grad, lap = grad_lap(x, None, sidx, key)
    kinetic = -lap - (grad**2).sum(axis=(-2, -1))
    expected = (2 * np.pi / L) ** 2 * (sp[np.asarray(sidx)] ** 2).sum(axis=(-2, -1))
    rel = np.abs(np.asarray(kinetic.real) - expected) / expected
    assert rel.max() < 5e-3, rel.max()  # observed ~1.2e-3 (generic AD engine)
    assert np.abs(np.asarray(kinetic.imag)).max() < 5e-2 * expected.max()


def test_ewald_split_independence_f32():
    """g_0/g_k cancellation survives f32: total energy independent of the split."""
    for dim in (2, 3):
        n = 7
        x = jax.random.uniform(jax.random.PRNGKey(0), (n, dim), jnp.float32)
        vals = []
        for kappa, Gmax in [(9.0, 14), (10.0, 15), (12.0, 18)]:
            G = jnp.asarray(cg.kpoints(dim, Gmax), jnp.float32)
            vals.append(
                float(cg.ewald_sum(x, kappa, G))
                + 0.5 * n * float(cg.madelung(dim, kappa, G))
            )
        scale = max(abs(v) for v in vals)
        assert np.ptp(vals) < 5e-5 * scale, (dim, vals)


def test_sr_solve_f32_vs_f64():
    """Damped Fisher solve: f32 update within 2e-3 relative of the f64 one."""
    P, batch = 512, 4096
    key = jax.random.PRNGKey(2)
    scores = jax.random.normal(key, (batch, P), jnp.float64) / np.sqrt(P)
    fisher64 = scores.T @ scores / batch
    grad64 = jax.random.normal(jax.random.PRNGKey(3), (P,), jnp.float64) * 1e-3
    u64 = _solve_scaled(fisher64, grad64, damping=1e-3, max_norm=1e-3)
    u32 = _solve_scaled(
        fisher64.astype(jnp.float32), grad64.astype(jnp.float32),
        damping=1e-3, max_norm=1e-3,
    )
    rel = float(jnp.linalg.norm(u32.astype(jnp.float64) - u64) / jnp.linalg.norm(u64))
    assert rel < 2e-3, rel


def test_sr_solve_f32_indefinite_no_nan():
    """A slightly indefinite damped Fisher (f32 roundoff) must not produce NaN."""
    P = 64
    key = jax.random.PRNGKey(4)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (P, P), jnp.float32))
    eigs = jnp.concatenate([jnp.full((P - 2,), 1e-2), jnp.array([-2e-3, -1e-3])])
    fisher = (q * eigs) @ q.T  # indefinite even after 1e-3 damping
    grad = jax.random.normal(jax.random.PRNGKey(5), (P,), jnp.float32)
    u = _solve_scaled(fisher, grad, damping=1e-3, max_norm=1e-3)
    assert bool(jnp.all(jnp.isfinite(u)))


def test_slogdet_phase_n57_c64():
    """Complex slogdet at n=57 in c64: log|det| and phase vs c128."""
    n = 57
    sp, x, L = _planewave(n, 2, 49, jnp.float64)
    k = 2 * np.pi / L * sp[:n]
    ang = np.asarray(x) @ k.T
    D128 = L ** (-1.0) * np.exp(1j * ang)
    D64 = D128.astype(np.complex64)
    p128, ld128 = np.linalg.slogdet(D128)
    p64, ld64 = jnp.linalg.slogdet(jnp.asarray(D64))
    assert abs(float(ld64) - ld128) < 5e-3 * max(1.0, abs(ld128)), (float(ld64), ld128)
    dphase = np.angle(complex(p64) / p128)
    assert abs(dphase) < 5e-2, dphase


def test_analytic_laplacian_f32_vs_f64():
    """Production Laplacian engine: f32 kinetic within 1e-3 relative of f64."""
    n, dim, batch = 7, 2, 8
    L = float(np.sqrt(np.pi * n))
    sp64, _, _ = _planewave(n, dim, 9, jnp.float64)
    key = jax.random.PRNGKey(6)
    flow_cfg = cg.FermiNetConfig(2, 8, 8, L)
    params64 = cg.init_ferminet_params(key, flow_cfg, dim, jnp.float64)
    params32 = jax.tree.map(lambda a: a.astype(jnp.float32), params64)
    x64 = jax.random.uniform(key, (batch, n, dim), jnp.float64, 0.0, L)
    sidx = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (batch, 1))

    def kinetic(params, x, sp, hutch_key):
        flow_apply = lambda p, q: cg.ferminet_apply(p, flow_cfg, q)
        gl = make_logpsi_grad_laplacian_analytic(flow_apply, sp, L, hutchinson=False)
        grad, lap = gl(x, params, sidx, hutch_key)
        return np.asarray((-lap - (grad**2).sum(axis=(-2, -1))).real)

    k64 = kinetic(params64, x64, sp64, key)
    k32 = kinetic(params32, x64.astype(jnp.float32), sp64.astype(np.float32), key)
    rel = np.abs(k32 - k64) / np.abs(k64)
    assert rel.max() < 1e-3, rel.max()


def test_hybrid_fisher_f32_vs_f64():
    """Quantum/classical Fisher build: f32 matrices close to f64."""
    n, dim, batch, Emax = 5, 2, 256, 9
    L = float(np.sqrt(np.pi * n))
    sp64, _, _ = _planewave(n, dim, Emax, jnp.float64)
    M = sp64.shape[0]
    key = jax.random.PRNGKey(7)
    van_cfg = cg.TransformerConfig(M, 1, 8, 2, 16)

    params64 = cg.init_transformer_params(key, van_cfg, dim, jnp.float64)

    def fishers(dtype):
        sp = sp64.astype(np.dtype(dtype).name)
        # cast (not re-draw): jax.random consumes bits differently per dtype
        params = jax.tree.map(lambda a: a.astype(dtype), params64)
        _, log_prob = cg.make_autoregressive_sampler(van_cfg, sp, n, M)
        score_fn = cg.make_classical_score(log_prob)
        si = jax.vmap(lambda k: jnp.sort(jax.random.choice(k, M, (n,), replace=False)))(
            jax.random.split(key, batch)
        ).astype(jnp.int32)
        from coulombgas_tpu.optim.sr import _ravel_batch

        s = _ravel_batch(score_fn(params, si))
        return np.asarray(s.T @ s / batch, np.float64)

    f64 = fishers(jnp.float64)
    f32 = fishers(jnp.float32)
    scale = np.abs(f64).max()
    assert np.abs(f32 - f64).max() < 1e-4 * scale, np.abs(f32 - f64).max() / scale


def test_sr_solve_scaling_refinement_restores_f64_accuracy():
    """Fisher-like matrix (wide diagonal spread): scaled f32 solve ~ f64.

    Fisher matrices here have score scales varying ~1e3 across parameter
    blocks, so cond is dominated by the diagonal spread — exactly what the
    Jacobi scaling in _solve_scaled removes before the f32 LU.
    """
    P = 512
    key = jax.random.PRNGKey(8)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (P, P), jnp.float64))
    eigs = 10.0 ** jnp.linspace(-2, 1, P)
    A = (q * eigs) @ q.T
    d = 10.0 ** jnp.linspace(-3, 3, P)  # per-block score-scale spread
    fisher64 = A * d[:, None] * d[None, :]
    grad64 = jax.random.normal(jax.random.PRNGKey(9), (P,), jnp.float64) * 1e-3
    want = _solve_scaled(fisher64, grad64, damping=1e-3, max_norm=1e-3)

    f32_args = (fisher64.astype(jnp.float32), grad64.astype(jnp.float32))
    got = _solve_scaled(*f32_args, damping=1e-3, max_norm=1e-3, jacobi=True, refine=2)
    rel = float(jnp.linalg.norm(got.astype(jnp.float64) - want) / jnp.linalg.norm(want))
    assert rel < 1e-4, rel


def test_sr_solve_chol_matches_f64():
    """Guarded-Cholesky solver ('chol'): same accuracy bar as LU-refined.

    The chol path exists because LU's pivot machinery crashed the XLA TPU
    compiler at production P (data/parity_n49_refined.log); it must match
    the f64 solution on the same Fisher-like spread as the LU-refined test.
    """
    P = 512
    key = jax.random.PRNGKey(8)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (P, P), jnp.float64))
    eigs = 10.0 ** jnp.linspace(-2, 1, P)
    A = (q * eigs) @ q.T
    d = 10.0 ** jnp.linspace(-3, 3, P)
    fisher64 = A * d[:, None] * d[None, :]
    grad64 = jax.random.normal(jax.random.PRNGKey(9), (P,), jnp.float64) * 1e-3
    want = _solve_scaled(fisher64, grad64, damping=1e-3, max_norm=1e-3)

    f32_args = (fisher64.astype(jnp.float32), grad64.astype(jnp.float32))
    got = _solve_scaled(*f32_args, damping=1e-3, max_norm=1e-3,
                        jacobi=True, refine=2, chol=True)
    rel = float(jnp.linalg.norm(got.astype(jnp.float64) - want) / jnp.linalg.norm(want))
    assert rel < 1e-4, rel


def test_sr_solve_chol_indefinite_boosts_damping():
    """Indefinite centered-Fisher input: the chol path must produce a FINITE
    step (boosted-damping refactorization), never NaN parameters."""
    P = 64
    key = jax.random.PRNGKey(4)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (P, P), jnp.float32))
    eigs = jnp.concatenate([jnp.full((P - 2,), 1e-2), jnp.array([-2e-3, -1e-3])])
    fisher = (q * eigs) @ q.T  # indefinite even after 1e-3 damping
    grad = jax.random.normal(jax.random.PRNGKey(5), (P,), jnp.float32)
    u = _solve_scaled(fisher, grad, damping=1e-3, max_norm=1e-3,
                      jacobi=True, refine=2, chol=True)
    assert bool(jnp.all(jnp.isfinite(u)))
    # -2e-3 min eigenvalue + 1e-3 + 32e-3 boost -> SPD: the step should be
    # nonzero (the boost rescues the factorization rather than zeroing).
    assert float(jnp.linalg.norm(u)) > 0.0


def test_sr_solve_chol_under_jit():
    """The guarded double-factorization must be jittable (lax-free where)."""
    P = 128
    scores = jax.random.normal(jax.random.PRNGKey(6), (1024, P), jnp.float32)
    fisher = scores.T @ scores / 1024
    grad = jax.random.normal(jax.random.PRNGKey(7), (P,), jnp.float32) * 1e-3
    f = jax.jit(lambda F, g: _solve_scaled(F, g, damping=1e-3, max_norm=1e-3,
                                           jacobi=True, refine=2, chol=True))
    u = f(fisher, grad)
    u_ref = _solve_scaled(fisher.astype(jnp.float64), grad.astype(jnp.float64),
                          damping=1e-3, max_norm=1e-3)
    rel = float(jnp.linalg.norm(u.astype(jnp.float64) - u_ref)
                / jnp.linalg.norm(u_ref))
    assert bool(jnp.all(jnp.isfinite(u)))
    assert rel < 1e-3, rel
