"""Sampler tests: ordering contracts and exact normalization.

The exhaustive normalization test (sum over all C(M, n) ordered states of
exp(log_prob) == 1) is the strongest guard on the ordered-occupation mask.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from coulombgas_tpu import (
    TransformerConfig,
    init_transformer_params,
    make_autoregressive_sampler,
    sp_orbitals,
)


def _setup(n=4, Emax=2):
    indices, Es = sp_orbitals(2, Emax)
    M = Es.size
    cfg = TransformerConfig(M, 2, 16, 4, 32)
    params = init_transformer_params(jax.random.PRNGKey(0), cfg, 2, jnp.float64)
    sp = jnp.asarray(indices[::-1].copy(), jnp.float64)
    return cfg, params, sp, n, M


def test_sample_contracts():
    cfg, params, sp, n, M = _setup()
    sampler, _ = make_autoregressive_sampler(cfg, sp, n, M)
    s = jax.jit(sampler, static_argnums=2)(params, jax.random.PRNGKey(1), 64)
    s = np.asarray(s)
    assert s.shape == (64, n)
    assert s.min() >= 0 and s.max() < M
    assert np.all(np.diff(s, axis=1) > 0), "occupations must be strictly increasing"


def test_mask_structure():
    cfg, params, sp, n, M = _setup()
    mask_fn, _, _ = make_autoregressive_sampler(cfg, sp, n, M, mask_fn=True)
    state_idx = jnp.array([1, 4, 5, 7])
    mask = np.asarray(mask_fn(state_idx))
    # row 0: anything up to M-n
    assert np.array_equal(np.nonzero(mask[0])[0], np.arange(0, M - n + 1))
    # row i: indices in (state_idx[i-1], M-n+i]
    for i in range(1, n):
        lo, hi = int(state_idx[i - 1]), M - n + i
        assert np.array_equal(np.nonzero(mask[i])[0], np.arange(lo + 1, hi + 1))


def test_exact_normalization():
    """VERY STRONG CHECK: probabilities over all ordered states sum to 1."""
    n, Emax = 4, 2  # M = 9 states -> C(9,4) = 126 configurations
    cfg, params, sp, n, M = _setup(n, Emax)
    _, log_prob = make_autoregressive_sampler(cfg, sp, n, M)
    states = jnp.array(list(itertools.combinations(range(M), n)), dtype=jnp.int32)
    logps = jax.vmap(log_prob, (None, 0))(params, states)
    total = jnp.exp(logps).sum()
    np.testing.assert_allclose(float(total), 1.0, rtol=1e-10)


def test_sampler_matches_log_prob_distribution():
    """Empirical frequencies agree with exact probabilities (chi^2-ish)."""
    n, Emax = 2, 1  # M = 5, C(5,2) = 10 states
    cfg, params, sp, n, M = _setup(n, Emax)
    sampler, log_prob = make_autoregressive_sampler(cfg, sp, n, M)
    states = jnp.array(list(itertools.combinations(range(M), n)), dtype=jnp.int32)
    probs = np.exp(np.asarray(jax.vmap(log_prob, (None, 0))(params, states)))

    B = 20000
    s = np.asarray(jax.jit(sampler, static_argnums=2)(params, jax.random.PRNGKey(7), B))
    keys = {tuple(row): k for k, row in enumerate(np.asarray(states))}
    counts = np.zeros(len(keys))
    for row in s:
        counts[keys[tuple(row)]] += 1
    freq = counts / B
    # 5-sigma binomial tolerance per state
    sigma = np.sqrt(probs * (1 - probs) / B)
    assert np.all(np.abs(freq - probs) < 5 * sigma + 1e-3)
