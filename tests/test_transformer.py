"""VAN transformer tests: parameter counts, autoregressivity, KV-cache decode."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from coulombgas_tpu import (
    TransformerConfig,
    init_kv_cache,
    init_transformer_params,
    transformer_apply,
    transformer_decode_step,
)


def _make(M=30, nlayers=2, D=16, nh=4, H=32, din=2, dtype=jnp.float64):
    cfg = TransformerConfig(M, nlayers, D, nh, H)
    params = init_transformer_params(jax.random.PRNGKey(0), cfg, din, dtype)
    return cfg, params


def test_param_count():
    M, L, D, nh, H, din = 30, 2, 16, 4, 32, 2
    cfg, params = _make(M, L, D, nh, H, din)
    expected = (
        (din * D + D)                       # embedding
        + L * (4 * (D * D + D)              # attention q/k/v/o
               + (D * H + H) + (H * D + D)) # MLP
        + (D * M + M)                       # output head
        + M                                 # x1hat
    )
    assert ravel_pytree(params)[0].size == expected


def test_autoregressivity_jacobian_sparsity():
    """Row i of the (shifted) output must not depend on tokens >= i."""
    cfg, params = _make()
    n = 6
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 2), jnp.float64)
    jac = jax.jacrev(lambda x: transformer_apply(params, cfg, x))(x)
    # jac: (n, M, n, din); dependence of out-row i on token j
    dep = np.abs(np.asarray(jac)).sum(axis=(1, 3))  # (n_out, n_in)
    # strictly lower triangular: out-row i depends only on tokens < i
    assert np.all(dep[np.triu_indices(n, k=0)] == 0.0)
    # and the model is not trivially zero
    assert np.any(dep[np.tril_indices(n, k=-1)] != 0.0)


def test_kv_decode_matches_full_forward():
    cfg, params = _make()
    n = 7
    tokens = jax.random.normal(jax.random.PRNGKey(2), (n, 2), jnp.float64)
    full = transformer_apply(params, cfg, tokens)
    kc, vc = init_kv_cache(cfg, n, jnp.float64)
    rows = [params["x1hat"]]
    for pos in range(n - 1):
        row, kc, vc = transformer_decode_step(params, cfg, tokens[pos], pos, kc, vc)
        rows.append(row)
    dec = jnp.stack(rows)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(full), atol=1e-12)
