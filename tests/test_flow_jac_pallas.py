"""Batch-in-lanes Pallas FermiNet forward+Jacobian kernel vs the jnp path.

Runs the actual kernel code in interpret mode on CPU (the real TPU path is
exercised by the production bench and parity runs).  The kernel feeds the
fused log-det tail (ops/pallas_fused_logp.py) in batch-last layout, so the
combined two-kernel logp is also checked against the slogdet oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coulombgas_tpu as cg
from coulombgas_tpu.ops.pallas_flow_jac import flow_u_jac_pallas
from coulombgas_tpu.wavefunction.fast_logp import make_logp_fast

from test_fast_logp import _setup


@pytest.mark.parametrize("depth,dim,n", [(2, 2, 7), (3, 2, 5), (2, 3, 6), (4, 2, 4)])
def test_flow_jac_kernel_matches_jnp(depth, dim, n):
    L = 3.21
    key = jax.random.PRNGKey(depth + dim + n)
    cfg = cg.FermiNetConfig(depth, 16, 16, L)
    params = cg.init_ferminet_params(key, cfg, dim, jnp.float32)
    B = 9  # exercises lane padding too
    x = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)
    u_t, J_t = flow_u_jac_pallas(params, cfg, x, interpret=True)
    u_ref, J_ref = jax.vmap(lambda q: cg.ferminet_apply_and_jac(params, cfg, q))(x)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(u_t), -1, 0), np.asarray(u_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(J_t), -1, 0), np.asarray(J_ref), atol=1e-5
    )


def test_all_pallas_logp_matches_slogdet():
    """make_logp_fast with the full two-kernel path == the slogdet assembly."""
    flow_apply, params, sp_twist, L, x, si = _setup(
        n=7, dim=2, Emax=9, batch=12, dtype=jnp.float32
    )
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    jac = lambda p, q: cg.ferminet_apply_and_jac(p, cfg, q)
    unfused = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False,
                             jacobian=jac, use_fused=False)
    all_pallas = make_logp_fast(flow_apply, sp_twist, L, jacobian=jac,
                                pallas_flow_cfg=cfg, fused_interpret=True)
    np.testing.assert_allclose(
        np.asarray(all_pallas(x, params, si)), np.asarray(unfused(x, params, si)),
        rtol=0, atol=5e-3,
    )


@pytest.mark.parametrize("dim,n", [(2, 9), (3, 8)])
def test_flow_jac_large_path_matches_jnp(dim, n):
    """Row-chunked per-layer kernels (the n>32 path) vs the jnp Jacobian."""
    from coulombgas_tpu.ops.pallas_flow_jac import flow_u_jac_pallas_large

    L = 4.1
    key = jax.random.PRNGKey(dim + n)
    cfg = cg.FermiNetConfig(2, 16, 16, L)
    params = cg.init_ferminet_params(key, cfg, dim, jnp.float32)
    B = 9
    x = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)
    u_t, J_t = flow_u_jac_pallas_large(params, cfg, x, interpret=True)
    u_ref, J_ref = jax.vmap(lambda q: cg.ferminet_apply_and_jac(params, cfg, q))(x)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(u_t), -1, 0), np.asarray(u_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(J_t), -1, 0), np.asarray(J_ref), atol=1e-5
    )


@pytest.mark.parametrize("dim,n", [(2, 7), (3, 5), (2, 13)])
def test_flow_jac_d2_kernel_matches_jnp(dim, n):
    """Single-kernel depth-2 structured closure vs the carried jnp Jacobian."""
    from coulombgas_tpu.ops.pallas_flow_jac import flow_u_jac_pallas_d2

    L = 3.21
    key = jax.random.PRNGKey(dim + n)
    cfg = cg.FermiNetConfig(2, 16, 16, L)
    params = cg.init_ferminet_params(key, cfg, dim, jnp.float32)
    B = 9  # exercises lane padding too
    x = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)
    u_t, J_t = flow_u_jac_pallas_d2(params, cfg, x, interpret=True)
    u_ref, J_ref = jax.vmap(lambda q: cg.ferminet_apply_and_jac(params, cfg, q))(x)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(u_t), -1, 0), np.asarray(u_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(J_t), -1, 0), np.asarray(J_ref), atol=1e-5
    )


def test_d2_kernel_logp_end_to_end():
    """make_logp_fast with use_d2_flow: d2 kernel + fused tail == slogdet path."""
    flow_apply, params, sp_twist, L, x, si = _setup(
        n=7, dim=2, Emax=9, batch=12, dtype=jnp.float32
    )
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    jac = lambda p, q: cg.ferminet_apply_and_jac(p, cfg, q)
    unfused = make_logp_fast(flow_apply, sp_twist, L, use_pallas=False,
                             jacobian=jac, use_fused=False)
    d2k = make_logp_fast(flow_apply, sp_twist, L, jacobian=jac,
                         pallas_flow_cfg=cfg, fused_interpret=True,
                         use_d2_flow=True)
    np.testing.assert_allclose(
        np.asarray(d2k(x, params, si)), np.asarray(unfused(x, params, si)),
        rtol=0, atol=5e-3,
    )


@pytest.mark.parametrize("dim,n", [(2, 7), (3, 5)])
def test_flow_jac_lap_d2_kernel_matches_jnp(dim, n):
    """d2 kernel with emit_lap vs the structured jnp jac+lap closure."""
    from coulombgas_tpu.models.ferminet_jac import ferminet_apply_jac_lap_d2
    from coulombgas_tpu.ops.pallas_flow_jac import flow_u_jac_lap_pallas_d2

    L = 3.21
    key = jax.random.PRNGKey(dim + n)
    cfg = cg.FermiNetConfig(2, 16, 16, L)
    params = cg.init_ferminet_params(key, cfg, dim, jnp.float32)
    B = 5  # exercises lane padding too
    x = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)
    u_t, J_t, lap_t = flow_u_jac_lap_pallas_d2(params, cfg, x, interpret=True)
    u_r, J_r, lap_r = jax.vmap(
        lambda q: ferminet_apply_jac_lap_d2(params, cfg, q)
    )(x)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(u_t), -1, 0), np.asarray(u_r), atol=1e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(J_t), -1, 0), np.asarray(J_r), atol=1e-5
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(lap_t), -1, 0), np.asarray(lap_r), atol=2e-4
    )


def test_grad_laplacian_batched_kernel_path():
    """fast_laplacian with flow_jac_lap_batched == the per-walker jnp path."""
    from coulombgas_tpu.ops.pallas_flow_jac import flow_u_jac_lap_pallas_d2
    from coulombgas_tpu.wavefunction.fast_laplacian import (
        make_logpsi_grad_laplacian_analytic,
    )

    flow_apply, params, sp_twist, L, x, si = _setup(
        n=7, dim=2, Emax=9, batch=4, dtype=jnp.float32
    )
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    from coulombgas_tpu.models.ferminet_jac import ferminet_apply_jac_lap_d2

    fjl = lambda p, q: ferminet_apply_jac_lap_d2(p, cfg, q)

    def fjl_batched(p, xb):
        u, J, lap = flow_u_jac_lap_pallas_d2(p, cfg, xb, interpret=True)
        return (jnp.moveaxis(u, -1, 0), jnp.moveaxis(J, -1, 0),
                jnp.moveaxis(lap, -1, 0))

    key = jax.random.PRNGKey(3)
    ref_fn = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp_twist, L, hutchinson=True, flow_jac_lap=fjl
    )
    ker_fn = make_logpsi_grad_laplacian_analytic(
        flow_apply, sp_twist, L, hutchinson=True, flow_jac_lap=fjl,
        flow_jac_lap_batched=fjl_batched,
    )
    g_ref, l_ref = ref_fn(x, params, si, key)
    g_ker, l_ker = ker_fn(x, params, si, key)
    np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                               rtol=0, atol=5e-4)
    np.testing.assert_allclose(np.asarray(l_ker), np.asarray(l_ref),
                               rtol=0, atol=5e-2)


def test_d2_kernel_hw_ceiling_guard():
    """Compiled (non-interpret) d2 kernel refuses n above the chip-validated
    ceiling with a clear error instead of an opaque toolchain crash.

    The round-4 chip probes showed the grid-accumulation d2 pipeline
    hard-crashes the TPU compile helper at n >= 49 (PERF.md round 4), so
    flow_u_jac_pallas_d2 must raise before tracing ever reaches Mosaic.
    Interpret mode keeps the full MAX_FLOW_N_D2 for correctness tests.
    """
    from coulombgas_tpu.ops.pallas_flow_jac import (
        MAX_FLOW_N_D2, MAX_FLOW_N_D2_HW, flow_u_jac_pallas_d2)

    n = MAX_FLOW_N_D2_HW + 1
    assert n <= MAX_FLOW_N_D2
    L, dim = 3.21, 2
    cfg = cg.FermiNetConfig(2, 8, 8, L)
    params = cg.init_ferminet_params(jax.random.PRNGKey(0), cfg, dim,
                                     jnp.float32)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, n, dim), jnp.float32,
                           0.0, L)
    with pytest.raises(ValueError, match="chip-validated"):
        flow_u_jac_pallas_d2(params, cfg, x, interpret=False)
