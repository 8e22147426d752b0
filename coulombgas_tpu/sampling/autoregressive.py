"""Exact autoregressive sampling of ordered momentum occupations, TPU-first.

Draws n-fermion occupation states k_1 < k_2 < ... < k_n from the VAN and
evaluates their exact log-probabilities.  Capability parity with reference
src/sampler.py:4-66, with a TPU-native sampler:

  * the reference re-runs the full transformer once per particle
    (O(n) full forwards = O(n^2) token work, src/sampler.py:30-38); here a
    ``lax.scan`` over particles drives the KV-cached single-token decode from
    models/transformer.py — O(n) token work, identical distribution (the
    decode path is differentially tested against the full forward);
  * random draws use the partitionable threefry PRNG, so under jit the
    (batch,) categorical samples shard over the device mesh with no
    host round-trips.

The ordered-occupation mask encodes "strictly increasing indices with room
for the remaining particles":  row i allows index m iff
m > state_idx[i-1]  and  m <= M - n + i.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.transformer import (
    TransformerConfig,
    init_kv_cache,
    transformer_apply,
    transformer_decode_step,
)

__all__ = ["make_autoregressive_sampler", "make_classical_score"]

_NEG_INF = -1e30


def make_autoregressive_sampler(
    cfg: TransformerConfig, sp_indices, n: int, num_states: int, mask_fn: bool = False
):
    """Build (sampler, log_prob) closures over the VAN.

    Args:
      cfg: transformer hyperparameters (output_size must equal num_states).
      sp_indices: (num_states, dim) float array of (twisted) momenta — the
        token embedding table, ordered the same way the VAN's logits are.
      n: number of fermions.
      num_states: number of single-particle states M.
      mask_fn: if True, additionally return the mask builder (for tests).

    Returns:
      sampler(params, key, batch) -> (batch, n) int32 occupation indices,
      log_prob(params, state_idx) -> scalar log p for one (n,) state.
    """
    M = num_states
    # Host numpy constant: baked into the jaxpr at trace time with no
    # device->host fetch during lowering (device-array constants round-trip
    # through the runtime, which is slow and fragile on remote TPU tunnels).
    sp_indices = np.asarray(sp_indices)

    def _mask(state_idx):
        """(n, M) 0/1 mask of allowed states given the sampled prefix."""
        band = jnp.tril(jnp.ones((n, M)), k=M - n)
        idx_lb = jnp.concatenate([jnp.array([-1], dtype=state_idx.dtype), state_idx[:-1]])
        return jnp.where(jnp.arange(M)[None, :] > idx_lb[:, None], band, 0.0)

    def _masked_logits(params, state_idx):
        """(n, M) logits with prohibited states at -inf-ish."""
        tokens = jnp.asarray(sp_indices)[state_idx]
        logits = transformer_apply(params, cfg, tokens)
        return jnp.where(_mask(state_idx) > 0, logits, _NEG_INF)

    def _row_mask(i, prev_idx):
        """Allowed-state mask for particle i given the previous index."""
        m = jnp.arange(M)
        return (m > prev_idx) & (m <= M - n + i)

    def sampler(params, key, batch: int):
        """Draw a batch of occupation states with KV-cached decoding."""
        dtype = params["x1hat"].dtype
        kc0, vc0 = init_kv_cache(cfg, n, dtype)
        kc0 = jnp.broadcast_to(kc0, (batch,) + kc0.shape)
        vc0 = jnp.broadcast_to(vc0, (batch,) + vc0.shape)
        # Row-0 logits are the learned x1hat — no transformer run needed.
        logits0 = jnp.broadcast_to(params["x1hat"], (batch, M))

        decode = jax.vmap(
            lambda tok, pos, kc, vc: transformer_decode_step(params, cfg, tok, pos, kc, vc),
            in_axes=(0, None, 0, 0),
        )

        def step(carry, inp):
            logits, prev, kc, vc = carry
            i, key_i = inp
            masked = jnp.where(_row_mask(i, prev[:, None]), logits, _NEG_INF)
            s_i = jax.random.categorical(key_i, masked, axis=-1).astype(jnp.int32)
            # Feed the chosen token to produce row i+1 logits (wasted at i=n-1).
            next_logits, kc, vc = decode(jnp.asarray(sp_indices)[s_i], i, kc, vc)
            return (next_logits, s_i, kc, vc), s_i

        keys = jax.random.split(key, n)
        init = (logits0, jnp.full((batch,), -1, jnp.int32), kc0, vc0)
        _, samples = jax.lax.scan(step, init, (jnp.arange(n), keys))
        return samples.T  # (batch, n)

    def log_prob(params, state_idx):
        """Exact log p(state_idx) for one (n,) ordered occupation state."""
        logits = _masked_logits(params, state_idx)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return logp[jnp.arange(n), state_idx].sum()

    if mask_fn:
        return _mask, sampler, log_prob
    return sampler, log_prob


def make_classical_score(log_prob):
    """Per-sample scores d log p / d params, batched (for the SR Fisher)."""
    return jax.vmap(jax.grad(log_prob), (None, 0), 0)
