"""Batched Metropolis MCMC over electron coordinates.

Capability parity with reference src/MCMC.py:6-40, designed for the
global-batch jit style of this framework: the walker batch is a single
sharded (batch, n, dim) array, random proposal/accept draws use the
partitionable threefry PRNG (so they shard over the mesh), and the returned
acceptance rate is the *global* mean — under jit over a sharded batch axis
the reduction lowers to an ICI all-reduce automatically (no explicit pmean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mcmc"]


def mcmc(logp_fn, x_init, key, mc_steps: int, mc_stddev=0.02):
    """Metropolis sampling with an isotropic Gaussian proposal.

    Args:
      logp_fn: x (batch, n, dim) -> (batch,) log-probabilities.
      x_init: (batch, n, dim) walkers.
      key: PRNG key.
      mc_steps: number of Metropolis sweeps (static).
      mc_stddev: proposal standard deviation.

    Returns:
      (x, accept_rate): final walkers and the mean acceptance rate.
    """

    def step(i, state):
        x, logp, key, num_accepts = state
        key, key_prop, key_acc = jax.random.split(key, 3)
        x_prop = x + mc_stddev * jax.random.normal(key_prop, x.shape, x.dtype)
        logp_prop = logp_fn(x_prop)
        ratio = jnp.exp(logp_prop - logp)
        accept = jax.random.uniform(key_acc, ratio.shape, ratio.dtype) < ratio
        # Stuck-walker rescue: a NaN proposal logp auto-rejects (NaN compares
        # False), but a walker whose CURRENT logp is non-finite (f32 overflow
        # in a pathological region) would then reject everything forever —
        # accept any finite proposal to bring it back.
        accept = accept | (~jnp.isfinite(logp) & jnp.isfinite(logp_prop))
        x_new = jnp.where(accept[:, None, None], x_prop, x)
        logp_new = jnp.where(accept, logp_prop, logp)
        return x_new, logp_new, key, num_accepts + accept.sum()

    logp_init = logp_fn(x_init)
    x, _, _, num_accepts = jax.lax.fori_loop(
        0, mc_steps, step, (x_init, logp_init, key, jnp.zeros((), x_init.dtype))
    )
    batch = x.shape[0]
    accept_rate = num_accepts / (mc_steps * batch)
    return x, accept_rate
