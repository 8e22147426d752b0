"""Jitted training steps: joint sampling, gradient accumulation, update.

Replaces the reference's pmapped ``sample_stateindices_and_x`` (src/VMC.py:8-25)
and the giant pmapped ``update`` (main.py:263-310) with three jitted
global-batch functions over a device mesh:

  * ``sample_step``   — VAN occupation draws + Metropolis coordinates,
  * ``accumulate``    — observables, REINFORCE grads, scores (+ Fisher terms),
                        summed into explicit accumulator pytrees,
  * ``apply_update``  — accumulator normalization, baseline correction, and
                        the optimizer step.

Splitting accumulate/apply compiles the expensive AD graph once (the
reference compiles its fused update twice, for final_step False/True), and
the accumulators are donated so grad accumulation is in-place in HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..optim.sr import HybridFisherSR
from ..sampling.mcmc import mcmc

__all__ = ["make_sample_step", "make_accumulate_and_apply", "init_accumulators"]


def make_sample_step(sampler, logp, mc_steps: int, mc_stddev, L, batch: int):
    """Joint sampling of occupations (exact) and coordinates (MCMC).

    Returns ``sample_step(params_van, params_flow, x, key) ->
    (state_indices, x, accept_rate)``; jit-with-shardings is applied by the
    driver.  Coordinates are wrapped back into [0, L).
    """

    def sample_step(params_van, params_flow, x, key):
        key_state, key_mcmc = jax.random.split(key)
        state_indices = sampler(params_van, key_state, batch)
        x, accept_rate = mcmc(
            lambda xx: logp(xx, params_flow, state_indices), x, key_mcmc, mc_steps, mc_stddev
        )
        x = x - L * jnp.floor(x / L)
        return state_indices, x, accept_rate

    return sample_step


def init_accumulators(params_van, params_flow, sr: bool, real_dtype=None, complex_dtype=None):
    """Zero accumulator pytree for one epoch of gradient accumulation."""
    from jax.flatten_util import ravel_pytree

    if complex_dtype is None:
        complex_dtype = (
            jnp.complex128 if jnp.dtype(real_dtype or jnp.float32) == jnp.float64 else jnp.complex64
        )
    zeros_like = lambda t: jax.tree.map(jnp.zeros_like, t)
    data = {
        k: jnp.zeros((), real_dtype)
        for k in (
            "F_mean", "F2_mean", "E_mean", "E2_mean", "K_mean",
            "K2_mean", "V_mean", "V2_mean", "S_mean", "S2_mean",
        )
    }
    acc = {
        "data": data,
        "grads": (zeros_like(params_van), zeros_like(params_flow)),
        "classical_score": zeros_like(params_van),
        "quantum_score": zeros_like(params_flow),
    }
    if sr:
        p_van = ravel_pytree(params_van)[0].size
        p_flow = ravel_pytree(params_flow)[0].size
        acc["classical_fisher"] = jnp.zeros((p_van, p_van), real_dtype)
        acc["quantum_fisher"] = jnp.zeros((p_flow, p_flow), real_dtype)
        # Re/Im stacked real layout — complex arrays cannot cross jit
        # boundaries on all TPU runtimes (see optim/sr.py).
        acc["quantum_score_mean"] = jnp.zeros((2, p_flow), real_dtype)
    return acc


def make_accumulate_and_apply(
    observable_and_lossfn,
    optimizer,
    acc_steps: int,
    sr_opt: HybridFisherSR | None = None,
    microbatch: int | None = None,
):
    """Build (accumulate, apply_update) for one training epoch.

    ``optimizer`` is an optax GradientTransformation when ``sr_opt`` is None,
    otherwise the HybridFisherSR named-tuple whose ``fishers``/``update`` are
    used.  Numerics follow reference main.py:263-310: per-step grads and
    scores are accumulated, then normalized by acc_steps, baseline-corrected
    (grad_van -= F_mean * score_van, grad_flow -= E_mean * score_flow) and fed
    to the optimizer.

    ``microbatch`` bounds the HBM peak of the AD graphs: the batch is split
    into chunks processed by a ``lax.scan`` *inside* the jitted program, so
    per-sample reverse-mode activations are live for one chunk at a time.
    This is the in-compiler analogue of the reference's host-level acc_steps
    loop — one executable, no extra dispatches.  (The REINFORCE clipping
    window is then computed per chunk rather than per acc-step batch; for
    chunks >= O(1k) samples the difference is statistically negligible.)
    """
    use_sr = sr_opt is not None

    def _one_batch(params_van, params_flow, state_indices, x, key):
        data, classical_lossfn, quantum_lossfn, aux = observable_and_lossfn(
            params_van, params_flow, state_indices, x, key
        )
        if use_sr and sr_opt.scores is not None:
            # SR already needs per-sample score matrices for the Fisher; the
            # REINFORCE gradients and mean scores are exact contractions of
            # the same matrices (the clipped weights are AD-constants in the
            # loss closures, see train/loss.py), so skip both loss jacrevs.
            from jax.flatten_util import ravel_pytree

            from ..optim.sr import fishers_from_scores

            s_c, s_q = sr_opt.scores(params_van, params_flow, state_indices, x)
            batch = s_c.shape[0]
            _, unravel_van = ravel_pytree(params_van)
            _, unravel_flow = ravel_pytree(params_flow)
            grad_van = unravel_van(s_c.T @ aux["Floc_clipped"] / batch)
            grad_flow = unravel_flow(
                2.0 * (s_q * aux["Eloc_clipped"].conj()[:, None]).real.mean(axis=0)
            )
            cf, qf, qsm = fishers_from_scores(s_c, s_q)
            return {
                "data": data,
                "grads": (grad_van, grad_flow),
                "classical_score": unravel_van(s_c.mean(axis=0)),
                "quantum_score": unravel_flow(2.0 * s_q.real.mean(axis=0)),
                "classical_fisher": cf,
                "quantum_fisher": qf,
                "quantum_score_mean": qsm,
            }
        # jacrev over the (loss, mean-logp) pair gives (REINFORCE grad, mean score).
        grad_van, classical_score = jax.jacrev(classical_lossfn)(params_van)
        grad_flow, quantum_score = jax.jacrev(quantum_lossfn)(params_flow)
        out = {
            "data": data,
            "grads": (grad_van, grad_flow),
            "classical_score": classical_score,
            "quantum_score": quantum_score,
        }
        if use_sr:
            cf, qf, qsm = sr_opt.fishers(params_van, params_flow, state_indices, x)
            out["classical_fisher"] = cf
            out["quantum_fisher"] = qf
            out["quantum_score_mean"] = qsm
        return out

    def accumulate(params_van, params_flow, state_indices, x, key, acc):
        batch = x.shape[0]
        add = lambda a, b: jax.tree.map(jnp.add, a, b)

        if microbatch is None or batch <= microbatch:
            contrib = _one_batch(params_van, params_flow, state_indices, x, key)
            return add(acc, contrib)

        assert batch % microbatch == 0, (batch, microbatch)
        nchunks = batch // microbatch
        si_c = state_indices.reshape(nchunks, microbatch, *state_indices.shape[1:])
        x_c = x.reshape(nchunks, microbatch, *x.shape[1:])
        keys = jax.random.split(key, nchunks)

        def chunk_step(carry, inp):
            si, xc, kc = inp
            contrib = _one_batch(params_van, params_flow, si, xc, kc)
            # equal-sized chunks: average now so acc keeps per-call means
            contrib = jax.tree.map(lambda t: t / nchunks, contrib)
            return add(carry, contrib), None

        zero = jax.tree.map(jnp.zeros_like, acc)
        summed, _ = jax.lax.scan(chunk_step, zero, (si_c, x_c, keys))
        return add(acc, summed)

    def apply_update(params_van, params_flow, opt_state, acc, trust_scale=1.0):
        # ``trust_scale``: the tripwire's trust-region escalation factor,
        # applied to the SR trust radius (max_norm); pass a jnp scalar so a
        # changed value does not recompile.  Ignored under plain optax.
        norm = lambda t: jax.tree.map(lambda a: a / acc_steps, t)
        data = norm(acc["data"])
        grad_van, grad_flow = norm(acc["grads"])
        classical_score = norm(acc["classical_score"])
        quantum_score = norm(acc["quantum_score"])

        # REINFORCE baseline correction (reference main.py:295-298).
        grad_van = jax.tree.map(lambda g, s: g - data["F_mean"] * s, grad_van, classical_score)
        grad_flow = jax.tree.map(lambda g, s: g - data["E_mean"] * s, grad_flow, quantum_score)
        grads = (grad_van, grad_flow)

        if use_sr:
            fishers = (
                norm(acc["classical_fisher"]),
                norm(acc["quantum_fisher"]),
                norm(acc["quantum_score_mean"]),
            )
            updates, opt_state = sr_opt.update(grads, opt_state, fishers,
                                               max_norm_scale=trust_scale)
            # surface the trust-region diagnostics (opt_state == diag dict)
            data = dict(data, **{"diag_" + k: v for k, v in opt_state.items()})
        else:
            updates, opt_state = optimizer.update(grads, opt_state)
        params_van, params_flow = optax.apply_updates((params_van, params_flow), updates)
        return params_van, params_flow, opt_state, data

    return accumulate, apply_update
