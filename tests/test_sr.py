"""Stochastic reconfiguration tests: Fisher assembly and solve numerics."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.flatten_util import ravel_pytree

from coulombgas_tpu.optim.sr import fisher_sr, hybrid_fisher_sr


def test_fisher_sr_matches_manual():
    """SR update equals the hand-computed damped natural-gradient step."""
    P = 6
    key = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(key, (P,), jnp.float64)}
    B = 64
    samples = jax.random.normal(jax.random.PRNGKey(1), (B, P), jnp.float64)

    # toy log-prob: logp(s) = params.w @ s  ->  score = s
    def log_prob(params, s):
        return params["w"] @ s

    score_fn = jax.vmap(jax.grad(log_prob), (None, 0), 0)
    damping, max_norm = 1e-3, 1e-2
    opt = fisher_sr(score_fn, damping, max_norm)

    grads = {"w": jax.random.normal(jax.random.PRNGKey(2), (P,), jnp.float64)}
    updates, _ = opt.update(grads, opt.init(params), params, samples)

    fisher = samples.T @ samples / B + damping * jnp.eye(P)
    manual = jnp.linalg.solve(fisher, grads["w"])
    gnorm = grads["w"] @ manual
    scale = min(float(jnp.sqrt(max_norm / gnorm)), 1.0)
    np.testing.assert_allclose(np.asarray(updates["w"]), np.asarray(-scale * manual), rtol=1e-10)


def test_hybrid_fisher_centering():
    """Quantum Fisher must be centered by the mean-score outer product."""
    Pv, Pf, B = 4, 3, 128
    kv = jax.random.PRNGKey(3)
    c_scores = jax.random.normal(kv, (B, Pv), jnp.float64)
    q_scores = jax.random.normal(jax.random.PRNGKey(4), (B, Pf), jnp.float64) + (
        1j * jax.random.normal(jax.random.PRNGKey(5), (B, Pf), jnp.float64)
    )

    classical_score_fn = lambda pv, s: {"w": c_scores}
    quantum_score_fn = lambda x, pf, s: {"w": q_scores}
    sr = hybrid_fisher_sr(classical_score_fn, quantum_score_fn, 1e-3, 1e-3)

    cf, qf, qsm = sr.fishers(None, None, None, None)
    np.testing.assert_allclose(np.asarray(cf), np.asarray(c_scores.T @ c_scores / B), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(qf), np.asarray((q_scores.conj().T @ q_scores).real / B), rtol=1e-12
    )
    # quantum score mean crosses the jit boundary Re/Im-stacked (TPU c64 I/O)
    qsm_c = np.asarray(qsm[0]) + 1j * np.asarray(qsm[1])
    np.testing.assert_allclose(qsm_c, np.asarray(q_scores.mean(axis=0)), rtol=1e-12)

    # update with zero grads is zero; with aligned grads it shrinks by trust region
    grads = ({"w": jnp.ones((Pv,), jnp.float64)}, {"w": jnp.ones((Pf,), jnp.float64)})
    (uv, uf), _ = sr.update(grads, (), (cf, qf, qsm))
    assert np.all(np.isfinite(np.asarray(uv["w"])))
    assert np.all(np.isfinite(np.asarray(uf["w"])))
    # trust region: when the raw natural-gradient norm g.F^-1.g exceeds
    # max_norm, the step is scaled so |g . delta| = sqrt(max_norm * gnorm)
    delta_v = np.asarray(uv["w"])
    g_v = np.ones(Pv)
    cf_d = np.asarray(cf) + 1e-3 * np.eye(Pv)
    raw = np.linalg.solve(cf_d, g_v)
    gnorm = g_v @ raw
    expected = np.sqrt(1e-3 * gnorm) if gnorm > 1e-3 else gnorm
    np.testing.assert_allclose(abs(g_v @ delta_v), expected, rtol=1e-10)
