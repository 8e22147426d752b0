"""Analytic FermiNet Jacobian vs generic forward-mode AD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import coulombgas_tpu as cg
from coulombgas_tpu.models.ferminet_jac import ferminet_apply_and_jac


def _jacfwd_ref(params, cfg, x):
    n, dim = x.shape
    flat = lambda xf: cg.ferminet_apply(params, cfg, xf.reshape(n, dim)).reshape(-1)
    return jax.jacfwd(flat)(x.reshape(-1))


@pytest.mark.parametrize("depth,dim,n", [(2, 2, 7), (3, 2, 5), (2, 3, 6), (4, 2, 4)])
def test_analytic_jacobian_matches_jacfwd(depth, dim, n):
    L = 5.0
    cfg = cg.FermiNetConfig(depth, 8, 8, L)
    key = jax.random.PRNGKey(depth * 10 + dim)
    params = cg.init_ferminet_params(key, cfg, dim, jnp.float64)
    # init_stddev is small; scale weights up so the test is not trivially
    # passing on a near-identity flow
    params = jax.tree.map(lambda a: 30.0 * a, params)
    x = jax.random.uniform(key, (n, dim), jnp.float64, 0.0, L)

    z, J = ferminet_apply_and_jac(params, cfg, x)
    np.testing.assert_allclose(
        np.asarray(z), np.asarray(cg.ferminet_apply(params, cfg, x)), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(J), np.asarray(_jacfwd_ref(params, cfg, x)), atol=1e-11
    )


def test_analytic_jacobian_translation_block_structure():
    """Continuous-translation equivariance implies row sums of J are identity."""
    cfg = cg.FermiNetConfig(2, 8, 8, 5.0)
    key = jax.random.PRNGKey(0)
    params = cg.init_ferminet_params(key, cfg, 2, jnp.float64)
    x = jax.random.uniform(key, (6, 2), jnp.float64, 0.0, 5.0)
    _, J = ferminet_apply_and_jac(params, cfg, x)
    # sum over source particles l of the (i,b,l,a) blocks = d z_i / d a_global
    block = J.reshape(6, 2, 6, 2).sum(axis=2)
    np.testing.assert_allclose(
        np.asarray(block), np.broadcast_to(np.eye(2), (6, 2, 2)), atol=1e-10
    )


@pytest.mark.parametrize("depth,dim,n", [(2, 2, 6), (3, 2, 5), (2, 3, 5)])
def test_analytic_laplacian_matches_ad(depth, dim, n):
    from coulombgas_tpu.models.ferminet_jac import ferminet_apply_jac_lap

    L = 5.0
    cfg = cg.FermiNetConfig(depth, 8, 8, L)
    key = jax.random.PRNGKey(depth + dim)
    params = cg.init_ferminet_params(key, cfg, dim, jnp.float64)
    params = jax.tree.map(lambda a: 30.0 * a, params)
    x = jax.random.uniform(key, (n, dim), jnp.float64, 0.0, L)
    nd = n * dim

    z, J, lap = ferminet_apply_jac_lap(params, cfg, x)
    z_ref, J_ref = ferminet_apply_and_jac(params, cfg, x)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-12)

    # forward-over-forward oracle: sum of second directional derivatives
    flat = lambda xf: cg.ferminet_apply(params, cfg, xf.reshape(n, dim)).reshape(-1)
    def dir_second(e):
        f_e = lambda xf: jax.jvp(flat, (xf,), (e,))[1]
        return jax.jvp(f_e, (x.reshape(-1),), (e,))[1]
    lap_ref = jax.vmap(dir_second, in_axes=1, out_axes=1)(
        jnp.eye(nd, dtype=jnp.float64)
    ).sum(axis=1)
    np.testing.assert_allclose(np.asarray(lap), np.asarray(lap_ref),
                               rtol=1e-9, atol=1e-9)


def test_structured_d2_jacobian_matches_carried_and_ad():
    """Depth-2 closed-form Jacobian == carried-state analytic == jacfwd.

    The structured form (ferminet_apply_and_jac_d2) materializes no
    (n, n, dim, S) single-particle Jacobian state; it must stay exactly
    equal (to roundoff) to both other implementations, for dim 2 and 3.
    """
    import numpy as np

    from coulombgas_tpu.models.ferminet import ferminet_apply
    from coulombgas_tpu.models.ferminet_jac import ferminet_apply_and_jac_d2

    for n, dim in [(5, 2), (4, 3)]:
        cfg = cg.FermiNetConfig(2, 8, 8, float(np.sqrt(np.pi * n)))
        key = jax.random.PRNGKey(0)
        params = cg.init_ferminet_params(key, cfg, dim, jnp.float64)
        params = jax.tree.map(
            lambda a: a + 0.3 * jax.random.normal(jax.random.PRNGKey(1), a.shape, a.dtype),
            params,
        )
        x = jax.random.uniform(jax.random.PRNGKey(2), (n, dim), jnp.float64, 0.0, cfg.L)
        z0, J0 = ferminet_apply_and_jac(params, cfg, x)
        z1, J1 = ferminet_apply_and_jac_d2(params, cfg, x)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(J1), np.asarray(J0), rtol=0, atol=1e-12)
        Jad = jax.jacfwd(
            lambda q: ferminet_apply(params, cfg, q.reshape(n, dim)).ravel()
        )(x.ravel())
        np.testing.assert_allclose(np.asarray(J1), np.asarray(Jad), rtol=0, atol=1e-12)


def test_structured_d2_jac_lap_matches_carried():
    """Depth-2 closed-form jac+lap == the carried-state implementation."""
    import numpy as np

    from coulombgas_tpu.models.ferminet_jac import (
        ferminet_apply_jac_lap, ferminet_apply_jac_lap_d2,
    )

    for n, dim in [(5, 2), (4, 3)]:
        cfg = cg.FermiNetConfig(2, 8, 8, float(np.sqrt(np.pi * n)))
        params = cg.init_ferminet_params(jax.random.PRNGKey(0), cfg, dim, jnp.float64)
        params = jax.tree.map(
            lambda a: a + 0.3 * jax.random.normal(jax.random.PRNGKey(1), a.shape, a.dtype),
            params,
        )
        x = jax.random.uniform(jax.random.PRNGKey(2), (n, dim), jnp.float64, 0.0, cfg.L)
        z0, J0, L0 = ferminet_apply_jac_lap(params, cfg, x)
        z1, J1, L1 = ferminet_apply_jac_lap_d2(params, cfg, x)
        np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), rtol=0, atol=1e-14)
        np.testing.assert_allclose(np.asarray(J1), np.asarray(J0), rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(L1), np.asarray(L0), rtol=0, atol=1e-12)


def test_select_flow_jac_auto_is_carried():
    """Pin the measured-faster default: 'auto' must resolve to the
    carried-state path (BENCH_r02 showed the d2 closure 15-25% slower
    end-to-end at every benched config; the default was reverted in round 3
    and this test guards against a silent re-flip).

    Two behavioral pins: (a) 'auto' works at depth != 2, which the d2
    closure cannot (it raises); (b) at depth 2 'auto' is bitwise identical
    to 'carried' on a random input, which the d2 closure is not (it agrees
    only to roundoff).
    """
    from coulombgas_tpu.models.ferminet_jac import select_flow_jac

    # (a) depth-3: d2 would raise; auto must not.
    cfg3 = cg.FermiNetConfig(3, 8, 8, 5.0)
    with pytest.raises(ValueError):
        select_flow_jac(cfg3, "d2")
    jac_auto3, _ = select_flow_jac(cfg3, "auto")
    params3 = cg.init_ferminet_params(jax.random.PRNGKey(0), cfg3, 2, jnp.float64)
    x3 = jax.random.uniform(jax.random.PRNGKey(1), (5, 2), jnp.float64, 0.0, 5.0)
    jac_auto3(params3, x3)  # must not raise

    # (b) depth-2: auto == carried bitwise.
    cfg = cg.FermiNetConfig(2, 8, 8, 5.0)
    params = cg.init_ferminet_params(jax.random.PRNGKey(2), cfg, 2, jnp.float64)
    params = jax.tree.map(lambda a: 30.0 * a, params)
    x = jax.random.uniform(jax.random.PRNGKey(3), (6, 2), jnp.float64, 0.0, 5.0)
    za, Ja = select_flow_jac(cfg, "auto")[0](params, x)
    zc, Jc = select_flow_jac(cfg, "carried")[0](params, x)
    assert (np.asarray(za) == np.asarray(zc)).all()
    assert (np.asarray(Ja) == np.asarray(Jc)).all()
    la = select_flow_jac(cfg, "auto")[1](params, x)[2]
    lc = select_flow_jac(cfg, "carried")[1](params, x)[2]
    assert (np.asarray(la) == np.asarray(lc)).all()
