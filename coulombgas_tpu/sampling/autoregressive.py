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
        # explicit f32: jnp.ones defaults to f64 under x64, which would drag
        # emulated-f64 elementwise ops into every TPU logits evaluation
        band = jnp.tril(jnp.ones((n, M), jnp.float32), k=M - n)
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
        """Draw a batch of occupation states with KV-cached decoding.

        Exactly n-1 decode steps: particle 0 is drawn from the learned
        ``x1hat`` logits with no transformer run, and each decode of token
        i-1 yields the row-i logits for the next draw (no wasted final step).
        """
        dtype = params["x1hat"].dtype
        kc0, vc0 = init_kv_cache(cfg, n, dtype)
        kc0 = jnp.broadcast_to(kc0, (batch,) + kc0.shape)
        vc0 = jnp.broadcast_to(vc0, (batch,) + vc0.shape)

        decode = jax.vmap(
            lambda tok, pos, kc, vc: transformer_decode_step(params, cfg, tok, pos, kc, vc),
            in_axes=(0, None, 0, 0),
        )

        keys = jax.random.split(key, n)
        logits0 = jnp.broadcast_to(params["x1hat"], (batch, M))
        masked0 = jnp.where(_row_mask(0, jnp.full((batch, 1), -1)), logits0, _NEG_INF)
        s_0 = jax.random.categorical(keys[0], masked0, axis=-1).astype(jnp.int32)

        def step(carry, inp):
            prev, kc, vc = carry
            i, key_i = inp
            logits, kc, vc = decode(jnp.asarray(sp_indices)[prev], i - 1, kc, vc)
            masked = jnp.where(_row_mask(i, prev[:, None]), logits, _NEG_INF)
            s_i = jax.random.categorical(key_i, masked, axis=-1).astype(jnp.int32)
            return (s_i, kc, vc), s_i

        _, samples = jax.lax.scan(step, (s_0, kc0, vc0), (jnp.arange(1, n), keys[1:]))
        return jnp.concatenate([s_0[:, None], samples.T], axis=1)  # (batch, n)

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
