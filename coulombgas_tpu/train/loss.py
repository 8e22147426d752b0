"""Observables and REINFORCE loss functions for the joint VMC objective.

F = E_p[ log p / beta + <E_loc>_Psi ] minimized over both the classical VAN
and the quantum flow.  Capability parity with reference src/VMC.py:31-80.

Global-batch design: all means are plain ``jnp.mean`` over the full (possibly
mesh-sharded) batch axis — under jit with a batch-sharded input XLA lowers
them to ICI all-reduces, replacing the reference's explicit
``jax.lax.pmean(..., axis_name="p")`` plumbing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..physics.ewald import potential_energy

__all__ = ["make_loss"]


def make_loss(log_prob, logpsi, logpsi_grad_laplacian, kappa, G, L, rs, Vconst, beta, clip_factor=5.0):
    """Build the observable/loss evaluator.

    Args:
      log_prob: batched VAN log-probability (params_van, (batch, n)) -> (batch,).
      logpsi: batched complex log Psi (x, params_flow, state_indices) -> (batch,).
      logpsi_grad_laplacian: batched derivative engine (see wavefunction.logpsi).
      kappa, G, L, rs, Vconst, beta: Ewald/physics constants; Vconst is the
        Madelung term n*rs/L*madelung(...) added to every potential sample.
      clip_factor: total-variation clipping width for the REINFORCE weights.

    Returns ``observable_and_lossfn(params_van, params_flow, state_indices,
    x, key) -> (observables dict, classical_lossfn, quantum_lossfn, aux)``;
    each loss closure returns (loss, mean score) — the mean score supports
    the baseline correction applied by the training driver.  ``aux`` carries
    the per-sample CLIPPED REINFORCE weights {"Floc_clipped" (B,),
    "Eloc_clipped" (B,) complex}: with per-sample scores S (as built for the
    SR Fisher) the loss gradients are exactly grad_van = S_c^T Floc_clipped/B
    and grad_flow = 2 Re(S_q^T conj(Eloc_clipped))/B — the weights are
    AD-constants in the reference's closures too (src/VMC.py:60-76), so the
    score-based form is the same estimator, letting the SR training step skip
    its loss jacrevs.
    """

    def observable_and_lossfn(params_van, params_flow, state_indices, x, key):
        logp_states = log_prob(params_van, state_indices)
        grad, laplacian = logpsi_grad_laplacian(x, params_flow, state_indices, key)

        kinetic = -laplacian - (grad**2).sum(axis=(-2, -1))
        potential = potential_energy(x, kappa, G, L, rs) + Vconst
        Eloc = kinetic + potential
        Floc = logp_states / beta + Eloc.real

        observable = {
            "K_mean": kinetic.real.mean(),
            "K2_mean": (kinetic.real**2).mean(),
            "V_mean": potential.mean(),
            "V2_mean": (potential**2).mean(),
            "E_mean": Eloc.real.mean(),
            "E2_mean": (Eloc.real**2).mean(),
            "F_mean": Floc.mean(),
            "F2_mean": (Floc**2).mean(),
            "S_mean": -logp_states.mean(),
            "S2_mean": (logp_states**2).mean(),
        }
        F_mean, E_mean = observable["F_mean"], observable["E_mean"]

        tvF = jnp.abs(Floc - F_mean).mean()
        Floc_clipped = jnp.clip(
            Floc, F_mean - clip_factor * tvF, F_mean + clip_factor * tvF
        )
        tvE = jnp.abs(Eloc - E_mean).mean()
        # complex-safe clip (jnp.clip rejects complex): clip the real part
        # and carry the imaginary part unchanged, matching the reference's
        # complex jnp.clip semantics (src/VMC.py:72-73).
        Eloc_clipped = jnp.clip(
            Eloc.real, E_mean - clip_factor * tvE, E_mean + clip_factor * tvE
        ) + 1j * Eloc.imag
        aux = {"Floc_clipped": Floc_clipped, "Eloc_clipped": Eloc_clipped}

        def classical_lossfn(params_van):
            logp = log_prob(params_van, state_indices)
            gradF_phi = (logp * Floc_clipped).mean()
            classical_score = logp.mean()
            return gradF_phi, classical_score

        def quantum_lossfn(params_flow):
            logpsix = logpsi(x, params_flow, state_indices)
            gradF_theta = 2 * (logpsix * Eloc_clipped.conj()).real.mean()
            quantum_score = 2 * logpsix.real.mean()
            return gradF_theta, quantum_score

        return observable, classical_lossfn, quantum_lossfn, aux

    return observable_and_lossfn
