"""Fused Pallas logp-tail kernel vs the slogdet and Gram-Cholesky oracles.

The kernel (ops/pallas_fused_logp.py) computes the whole MCMC coordinate
density tail — plane-wave matrix build, complex Hermitian Gram, Jacobian
Gram, and both pivot-free Cholesky log-dets — in one VMEM-resident pass.
These tests run the actual kernel code in interpret mode on CPU (the real
TPU path is exercised by the production bench and the parity runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coulombgas_tpu as cg
from coulombgas_tpu.ops.pallas_fused_logp import fused_logp_pallas
from coulombgas_tpu.wavefunction.fast_logp import make_logp_fast

from test_fast_logp import _setup


def _slogdet_oracle(u, kvec, J, L):
    dim = u.shape[-1]
    c = L ** (-dim / 2)
    u64, k64, J64 = (np.asarray(a, np.float64) for a in (u, kvec, J))
    D = c * np.exp(1j * np.einsum("bnd,bmd->bnm", u64, k64))
    return 2 * np.linalg.slogdet(D)[1] + np.linalg.slogdet(J64)[1]


@pytest.mark.parametrize("dim,n", [(2, 7), (3, 4)])
def test_fused_kernel_matches_slogdet(dim, n):
    flow_apply, params, sp_twist, L, x, si = _setup(
        n=n, dim=dim, Emax=6 if dim == 3 else 9, batch=12, dtype=jnp.float32
    )
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    u, J = jax.vmap(lambda q: cg.ferminet_apply_and_jac(params, cfg, q))(x)
    kvec = (2 * jnp.pi / L * jnp.asarray(sp_twist))[si]
    got = fused_logp_pallas(u, kvec, J, L, interpret=True)
    ref = _slogdet_oracle(u, kvec, J, L)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=5e-3)


def test_fused_kernel_lane_padding():
    """Batch not a multiple of 128 exercises the identity/unit-k padding."""
    flow_apply, params, sp_twist, L, x, si = _setup(
        n=5, dim=2, Emax=9, batch=7, dtype=jnp.float32
    )
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    u, J = jax.vmap(lambda q: cg.ferminet_apply_and_jac(params, cfg, q))(x)
    kvec = (2 * jnp.pi / L * jnp.asarray(sp_twist))[si]
    got = fused_logp_pallas(u, kvec, J, L, interpret=True)
    assert got.shape == (7,)
    ref = _slogdet_oracle(u, kvec, J, L)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=0, atol=5e-3)


def test_make_logp_fast_fused_path_matches_unfused():
    """The production wiring: make_logp_fast(use_fused via interpret) ==
    the jnp Gram-Cholesky composition on the same f32 inputs."""
    flow_apply, params, sp_twist, L, x, si = _setup(
        n=7, dim=2, Emax=9, batch=12, dtype=jnp.float32
    )
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    jac = lambda p, q: cg.ferminet_apply_and_jac(p, cfg, q)
    unfused = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False,
                             jacobian=jac, use_fused=False)
    fused = make_logp_fast(flow_apply, sp_twist, L, jacobian=jac,
                           fused_interpret=True)
    np.testing.assert_allclose(
        np.asarray(fused(x, params, si)), np.asarray(unfused(x, params, si)),
        rtol=0, atol=5e-3,
    )


def test_fused_kernel_near_singular_deflates():
    """A rank-deficient Jacobian must yield a large negative logp, not NaN."""
    n, dim, B = 5, 2, 3
    L = 2.5
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)
    kvec = jnp.broadcast_to(
        jnp.arange(1, n + 1, dtype=jnp.float32)[:, None], (n, dim)
    )[None].repeat(B, 0)
    J = jnp.tile(jnp.eye(n * dim, dtype=jnp.float32), (B, 1, 1))
    J = J.at[0, :, 0].set(0.0)  # singular first walker
    out = fused_logp_pallas(u, kvec, J, L, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(out[0]) < float(out[1]) - 10.0


def test_fused_vmem_gate_dim_aware():
    """The fused-kernel gate must scale with nd^2 = (n*dim)^2, not n alone.

    dim=2 production sizes (n <= 57) fit; dim=3 at the same n roughly
    doubles nd and quadruples the Gram scratch -> must be rejected
    (ADVICE round 1).
    """
    from coulombgas_tpu.ops.pallas_fused_logp import fused_fits, fused_vmem_bytes

    assert fused_fits(13, 2) and fused_fits(49, 2) and fused_fits(57, 2)
    assert not fused_fits(57, 3)
    assert fused_vmem_bytes(57, 3) > 1.8 * fused_vmem_bytes(57, 2)


def test_use_fused_requires_tpu_backend():
    """Explicit use_fused=True on a non-TPU backend must fail loudly."""
    import numpy as np
    import pytest

    from coulombgas_tpu.models.ferminet import FermiNetConfig, ferminet_apply, init_ferminet_params
    from coulombgas_tpu.physics.orbitals import sp_orbitals, twist_sort
    from coulombgas_tpu.wavefunction.fast_logp import make_logp_fast

    n, dim = 5, 2
    L = float(np.sqrt(np.pi * n))
    cfg = FermiNetConfig(2, 8, 8, L)
    params = init_ferminet_params(jax.random.PRNGKey(0), cfg, dim, jnp.float64)
    sp_indices, _ = sp_orbitals(dim, 4)
    sp_twist, _ = twist_sort(sp_indices, np.array([0.25, 0.25]))
    logp = make_logp_fast(lambda p, x: ferminet_apply(p, cfg, x),
                          np.asarray(sp_twist, np.float64), L, use_fused=True)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, n, dim), jnp.float64, 0, L)
    si = jnp.tile(jnp.arange(n)[None], (4, 1))
    with pytest.raises(ValueError, match="TPU backend"):
        logp(x, params, si)
