"""make_logp_fast (Gram-Cholesky path) vs make_logp (slogdet path).

The fast path is what the production MCMC uses; the slow path is the
capability-parity oracle (reference src/logpsi.py:174-181).
"""

import jax
import jax.numpy as jnp
import numpy as np

import coulombgas_tpu as cg
from coulombgas_tpu.wavefunction.fast_logp import make_logp_fast


def _setup(n=7, dim=2, Emax=9, batch=12, dtype=jnp.float64, seed=0):
    L = float(np.sqrt(np.pi * n)) if dim == 2 else (4 / 3 * np.pi * n) ** (1 / 3)
    sp_indices, _ = cg.sp_orbitals(dim, Emax)
    sp_twist, _ = cg.twist_sort(sp_indices, np.full(dim, 0.25))
    sp_twist = np.asarray(sp_twist[::-1].copy(), np.dtype(dtype).name)
    key = jax.random.PRNGKey(seed)
    flow_cfg = cg.FermiNetConfig(2, 8, 8, L)
    params = cg.init_ferminet_params(key, flow_cfg, dim, dtype)
    flow_apply = lambda p, xx: cg.ferminet_apply(p, flow_cfg, xx)
    x = jax.random.uniform(key, (batch, n, dim), dtype, 0.0, L)
    M = sp_twist.shape[0]
    si = jax.vmap(
        lambda k: jax.random.choice(k, M, (n,), replace=False)
    )(jax.random.split(key, batch))
    si = jnp.sort(si, axis=-1).astype(jnp.int32)
    return flow_apply, params, sp_twist, L, x, si


def test_fast_logp_matches_slogdet_f64_dim2():
    flow_apply, params, sp_twist, L, x, si = _setup(dim=2)
    slow = cg.make_logp(cg.make_logpsi(flow_apply, sp_twist, L))
    fast = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False)
    np.testing.assert_allclose(fast(x, params, si), slow(x, params, si),
                               rtol=1e-9, atol=1e-9)


def test_fast_logp_matches_slogdet_f64_dim3():
    flow_apply, params, sp_twist, L, x, si = _setup(n=7, dim=3, Emax=6, batch=8)
    slow = cg.make_logp(cg.make_logpsi(flow_apply, sp_twist, L))
    fast = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False)
    np.testing.assert_allclose(fast(x, params, si), slow(x, params, si),
                               rtol=1e-9, atol=1e-9)


def test_fast_logp_f32_accuracy():
    # production dtype: the deviation feeds exp(dlogp) in the accept ratio,
    # so it must stay well below the Metropolis noise scale
    flow_apply, params, sp_twist, L, x, si = _setup(dim=2, batch=32, dtype=jnp.float32)
    slow = cg.make_logp(cg.make_logpsi(flow_apply, sp_twist, L))
    fast = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False)
    err = jnp.abs(fast(x, params, si) - slow(x, params, si))
    assert float(err.max()) < 5e-3, float(err.max())


def test_fast_logp_pallas_interpret():
    # run the actual Pallas kernel (interpret mode) inside the full logp
    flow_apply, params, sp_twist, L, x, si = _setup(dim=2, batch=16, dtype=jnp.float32)
    from coulombgas_tpu.ops import logdet as _ld
    import coulombgas_tpu.ops.pallas_logdet as _pl

    slow = cg.make_logp(cg.make_logpsi(flow_apply, sp_twist, L))
    orig = _pl.chol_logdet_pallas
    try:
        _pl.chol_logdet_pallas = lambda A, interpret=False: orig(A, interpret=True)
        fast = make_logp_fast(flow_apply, sp_twist, L, use_pallas=True)
        err = jnp.abs(fast(x, params, si) - slow(x, params, si))
    finally:
        _pl.chol_logdet_pallas = orig
    assert float(err.max()) < 5e-3, float(err.max())


def test_fast_logp_translation_invariance():
    # logp must inherit the physical invariances of 2 Re log Psi
    flow_apply, params, sp_twist, L, x, si = _setup(dim=2)
    fast = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False)
    shift = jnp.array([0.37, -1.2])
    np.testing.assert_allclose(
        fast(x + shift, params, si), fast(x, params, si), rtol=1e-8, atol=1e-8
    )


def test_fast_logp_analytic_jacobian_matches():
    # production wiring: analytic flow Jacobian inside the fast logp
    from coulombgas_tpu.models.ferminet_jac import ferminet_apply_and_jac

    n, dim = 7, 2
    L = float(np.sqrt(np.pi * n))
    flow_cfg = cg.FermiNetConfig(2, 8, 8, L)
    key = jax.random.PRNGKey(3)
    params = cg.init_ferminet_params(key, flow_cfg, dim, jnp.float64)
    flow_apply = lambda p, xx: cg.ferminet_apply(p, flow_cfg, xx)
    sp_indices, _ = cg.sp_orbitals(dim, 9)
    sp, _ = cg.twist_sort(sp_indices, np.full(dim, 0.25))
    sp = np.asarray(sp[::-1].copy(), np.float64)
    x = jax.random.uniform(key, (12, n, dim), jnp.float64, 0.0, L)
    si = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (12, 1))

    ad = make_logp_fast(flow_apply, sp, L, use_pallas=False)
    analytic = make_logp_fast(
        flow_apply, sp, L, use_pallas=False, chunk=4,
        jacobian=lambda p, xx: ferminet_apply_and_jac(p, flow_cfg, xx),
    )
    np.testing.assert_allclose(analytic(x, params, si), ad(x, params, si),
                               rtol=1e-10, atol=1e-10)
