"""Differential tests for the batched Gram-Cholesky log-determinant ops.

Oracle: jnp.linalg.slogdet.  The Pallas kernel is exercised in interpreter
mode on CPU (the same kernel code path the TPU runs, minus Mosaic codegen).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coulombgas_tpu.ops.logdet import (
    chol_logdet_ref,
    gram_logabsdet,
    planewave_gram_embed,
)
from coulombgas_tpu.ops.pallas_logdet import chol_logdet_pallas


def _random_spd(key, batch, m, dtype, jitter=0.1):
    J = jnp.eye(m, dtype=dtype) + jitter * jax.random.normal(key, (batch, m, m), dtype)
    return jnp.einsum("bij,bkj->bik", J, J)


def test_chol_logdet_ref_matches_slogdet():
    A = _random_spd(jax.random.PRNGKey(0), 32, 26, jnp.float64)
    got = chol_logdet_ref(A)
    want = jnp.linalg.slogdet(A)[1]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_chol_logdet_ref_wide_conditioning():
    # eigenvalue spread ~1e6: still accurate in f64
    key = jax.random.PRNGKey(1)
    q, _ = jnp.linalg.qr(jax.random.normal(key, (8, 20, 20), jnp.float64))
    eigs = 10.0 ** jax.random.uniform(key, (8, 20), jnp.float64, -3, 3)
    A = jnp.einsum("bij,bj,bkj->bik", q, eigs, q)
    np.testing.assert_allclose(
        chol_logdet_ref(A), jnp.log(eigs).sum(-1), rtol=1e-8, atol=1e-8
    )


def test_chol_logdet_deflation_no_nan():
    # exactly singular (rank-deficient) matrices must give a finite, very
    # negative log det — never NaN (that would freeze the MCMC accept rule)
    v = jnp.ones((4, 6, 1), jnp.float64)
    A = v @ v.transpose(0, 2, 1)  # rank 1
    ld = chol_logdet_ref(A)
    assert bool(jnp.all(jnp.isfinite(ld)))
    assert bool(jnp.all(ld < -100.0))


def test_pallas_kernel_interpret_matches_ref():
    # batch NOT a multiple of 128 exercises the identity padding
    A = _random_spd(jax.random.PRNGKey(2), 200, 26, jnp.float32)
    got = chol_logdet_pallas(A, interpret=True)
    want = chol_logdet_ref(A)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_kernel_interpret_deflation():
    v = jnp.ones((4, 6, 1), jnp.float32)
    A = (v @ v.transpose(0, 2, 1)).astype(jnp.float32)
    ld = chol_logdet_pallas(A, interpret=True)
    assert bool(jnp.all(jnp.isfinite(ld)))
    assert bool(jnp.all(ld < -100.0))


def test_gram_logabsdet_matches_slogdet():
    key = jax.random.PRNGKey(3)
    J = jnp.eye(26, dtype=jnp.float64) + 0.2 * jax.random.normal(
        key, (64, 26, 26), jnp.float64
    )
    got = gram_logabsdet(J, use_pallas=False)
    want = jnp.linalg.slogdet(J)[1]  # |det| via LU log|det|
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_planewave_gram_embed_matches_complex_slogdet():
    key = jax.random.PRNGKey(4)
    kr, ki = jax.random.split(key)
    D = jax.random.normal(kr, (32, 13, 13), jnp.float64) + 1j * jax.random.normal(
        ki, (32, 13, 13), jnp.float64
    )
    embed = planewave_gram_embed(D.real, D.imag)
    got = 0.5 * chol_logdet_ref(embed)  # = 2 Re log det D
    want = 2.0 * jnp.linalg.slogdet(D)[1]
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_gj_inverse_spd_real_and_hermitian():
    from coulombgas_tpu.ops.logdet import gj_inverse_single

    key = jax.random.PRNGKey(5)
    B = jax.random.normal(key, (9, 9), jnp.float64)
    A = B @ B.T + 9 * jnp.eye(9)
    np.testing.assert_allclose(gj_inverse_single(A), jnp.linalg.inv(A),
                               rtol=1e-10, atol=1e-10)
    kr, ki = jax.random.split(key)
    C = jax.random.normal(kr, (7, 7), jnp.float64) + 1j * jax.random.normal(
        ki, (7, 7), jnp.float64
    )
    H = C.conj().T @ C + 7 * jnp.eye(7)
    np.testing.assert_allclose(gj_inverse_single(H), jnp.linalg.inv(H),
                               rtol=1e-10, atol=1e-10)


def test_gram_inverse_matches_linalg_inv():
    from coulombgas_tpu.ops.logdet import gram_inverse_single

    key = jax.random.PRNGKey(6)
    kr, ki = jax.random.split(key)
    D = jax.random.normal(kr, (11, 11), jnp.float64) + 1j * jax.random.normal(
        ki, (11, 11), jnp.float64
    )
    np.testing.assert_allclose(gram_inverse_single(D), jnp.linalg.inv(D),
                               rtol=1e-7, atol=1e-7)


def test_logdet_spd_custom_jvp_grad_and_hvp():
    """The closed-form derivative rule == generic AD through the Cholesky,
    in both reverse mode and forward-over-reverse (the Hutchinson path)."""
    from coulombgas_tpu.ops.logdet import chol_logdet_single, logdet_spd_single

    key = jax.random.PRNGKey(7)
    J = jnp.eye(8, dtype=jnp.float64) + 0.3 * jax.random.normal(
        key, (8, 8), jnp.float64
    )

    f_new = lambda J: logdet_spd_single(J @ J.T)
    f_old = lambda J: chol_logdet_single(J @ J.T)
    np.testing.assert_allclose(f_new(J), f_old(J), rtol=1e-12)
    np.testing.assert_allclose(jax.grad(f_new)(J), jax.grad(f_old)(J),
                               rtol=1e-9, atol=1e-10)
    v = jax.random.normal(jax.random.PRNGKey(8), J.shape, jnp.float64)
    hvp = lambda f: jax.jvp(jax.grad(f), (J,), (v,))[1]
    np.testing.assert_allclose(hvp(f_new), hvp(f_old), rtol=1e-8, atol=1e-9)
