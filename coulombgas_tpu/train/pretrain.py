"""Stage-1 free-fermion pretraining of the VAN (the end-to-end oracle slice).

Trains the autoregressive occupation model alone against the non-interacting
spectrum: loss E[logp * (F - F_mean)] with F = logp/beta + E(k), optionally
with classical-Fisher SR.  Validated against the exact mpmath canonical
analytics printed at start.  Capability parity with reference
src/freefermion/pretraining.py:9-108, rebuilt on the global-batch mesh style.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..analytic.canonical import Z_E, box_parameters
from ..io.logging import ObservableLog
from ..models.transformer import TransformerConfig, init_transformer_params
from ..optim.sr import fisher_sr
from ..parallel.mesh import batch_spec, make_mesh, replicated_spec
from ..physics.orbitals import sp_orbitals, twist_sort
from ..sampling.autoregressive import make_autoregressive_sampler, make_classical_score

__all__ = ["make_freefermion_loss", "pretrain"]


def make_freefermion_loss(log_prob, Es, beta, clip_factor=None):
    """REINFORCE loss for the non-interacting system (exact per-state E).

    ``clip_factor``: optional total-variation clipping of the centered
    REINFORCE weights (same 5xTV scheme the interacting loss uses,
    train/loss.py).  The reference's pretraining does not clip
    (src/freefermion/pretraining.py:11-30) and neither does the default —
    but near convergence in f32 the rare low-probability states carry
    weights |F - F_mean| ~ |log p|/beta that grow as the distribution
    sharpens, and at n >= 49 this drives an entropy-collapse limit cycle of
    the f32 SR dynamics (see PARITY.md); clipping bounds that feedback.
    """

    Es = np.asarray(Es)  # host constant; converted at trace time

    def loss_fn(params, state_indices):
        logp = log_prob(params, state_indices)
        E = jnp.asarray(Es)[state_indices].sum(axis=-1)
        F = jax.lax.stop_gradient(logp / beta + E)

        aux = {
            "E_mean": E.mean(), "E_std": E.std(),
            "F_mean": F.mean(), "F_std": F.std(),
            "S_mean": -logp.mean(), "S_std": logp.std(),
        }
        w = F - aux["F_mean"]
        if clip_factor is not None:
            tv = jnp.abs(w).mean()
            w = jnp.clip(w, -clip_factor * tv, clip_factor * tv)
        gradF = (logp * w).mean()
        return gradF, aux

    return loss_fn


def pretrain(
    cfg: TransformerConfig,
    params_van,
    n, dim, Theta, Emax, twist,
    path, key,
    lr, sr, damping, max_norm,
    batch, epoch=10000,
    mesh=None, dtype=None,
    check_analytic=True, dps=600,
    log_every=1, clip_factor=None,
    solver="plain",
    tripwire_sigma=15.0,
    ckpt_every=0, epoch_finished=0,
):
    """Train the VAN on free fermions; returns the trained parameters.

    Writes the 6-column data.txt log into ``path``; when ``check_analytic``
    the exact F/E/S are computed with the mpmath oracle and printed first.

    ``solver`` selects the SR dense-solve numerics: "plain" (f32 on device),
    "refined" (Jacobi scaling + 2 rounds of iterative refinement, still f32),
    "chol" (like "refined" but a guarded SPD Cholesky factorization instead
    of LU — avoids the XLA-TPU LU compiler crash at production P and stays
    entirely on device, unlike "host64" whose Fisher pull can dominate the
    epoch on a slow tunnel),
    or "host64" (the classical Fisher is pulled to the host every epoch and
    the damped solve runs in LAPACK float64 — the escape hatch for the
    large-n f32 SR plateau, see PARITY.md).
    """
    L, beta = (float(v) for v in box_parameters(n, dim, Theta))
    if dtype is None:
        dtype = params_van["x1hat"].dtype  # follow the model precision

    sp_indices, _ = sp_orbitals(dim, Emax)
    sp_indices_twist, Es_twist = twist_sort(sp_indices, twist)
    # Highest-energy states first, like the reference (main.py:90): the VAN
    # sees the (almost always empty) high tail at small indices where the
    # ordered-occupation band mask prunes hardest.
    sp_indices_twist = np.asarray(sp_indices_twist[::-1].copy(), dtype)
    Es_twist = np.asarray((2 * np.pi / L) ** 2 * np.asarray(Es_twist[::-1].copy()), dtype)

    if check_analytic:
        from mpmath import mp, mpf

        F, E, S = Z_E(n, dim, mpf(str(Theta)), [mpf(str(t)) for t in np.asarray(twist)],
                      Emax, dps=dps)
        print(
            "Analytic results for the thermodynamic quantities: "
            "F: %s, E: %s, S: %s" % (mp.nstr(F), mp.nstr(E), mp.nstr(S))
        )

    num_states = Es_twist.size
    sampler, log_prob_novmap = make_autoregressive_sampler(cfg, sp_indices_twist, n, num_states)
    log_prob = jax.vmap(log_prob_novmap, (None, 0), 0)
    loss_fn = make_freefermion_loss(log_prob, Es_twist, beta, clip_factor)

    host64 = sr and solver == "host64"
    refined = solver in ("refined", "chol")
    if sr:
        score_fn = make_classical_score(log_prob_novmap)
        optimizer = fisher_sr(score_fn, damping, max_norm,
                              refine=2 if refined else 0, jacobi=refined,
                              chol=solver == "chol")
    else:
        optimizer = optax.adam(lr)
    opt_state = optimizer.init(params_van)

    mesh = mesh if mesh is not None else make_mesh()
    from ..parallel.mesh import replicate

    params_van = replicate(params_van, mesh)  # multi-process-safe commit

    @jax.jit
    def update(params_van, opt_state, key, trust_scale):
        # trust_scale: tripwire trust-region escalation, traced so the SR
        # radius can shrink without recompiling (unused under adam)
        key, subkey = jax.random.split(key)
        state_indices = jax.lax.with_sharding_constraint(
            sampler(params_van, subkey, batch), batch_spec(mesh)
        )
        grads, aux = jax.grad(loss_fn, argnums=0, has_aux=True)(params_van, state_indices)
        if sr:
            updates, new_opt_state = optimizer.update(
                grads, opt_state, params_van, state_indices,
                max_norm_scale=trust_scale)
        else:
            updates, new_opt_state = optimizer.update(grads, opt_state)
        params_van = optax.apply_updates(params_van, updates)
        return params_van, new_opt_state, key, aux

    if host64:
        from jax.flatten_util import ravel_pytree

        from ..optim.host_sr import host_solve_scaled, sym_pack, sym_unpack
        from ..optim.sr import _ravel_batch

        _, unravel = ravel_pytree(jax.device_get(params_van))

        @jax.jit
        def grads_and_fisher(params_van, key):
            key, subkey = jax.random.split(key)
            state_indices = jax.lax.with_sharding_constraint(
                sampler(params_van, subkey, batch), batch_spec(mesh)
            )
            grads, aux = jax.grad(loss_fn, argnums=0, has_aux=True)(params_van, state_indices)
            score = _ravel_batch(score_fn(params_van, state_indices))
            fisher = score.T @ score / batch
            g, _ = ravel_pytree(grads)
            # symmetric Fisher: pull only the packed upper triangle (halves
            # the device->host transfer, the dominant host64 cost)
            return g, sym_pack(fisher), key, aux

        @jax.jit
        def apply_upd(params_van, uv):
            return optax.apply_updates(params_van, unravel(uv))

    is_main = jax.process_index() == 0
    log = ObservableLog(path, resume=epoch_finished > 0) if is_main else None
    sqrtb = float(np.sqrt(batch))

    # Same failure-detection/recovery as the interacting loop (train/tripwire.py):
    # the n=49 f32 probes showed rare catastrophic SR steps (discrete upward F
    # jump, then a dead deterministic collapse).  Observables at epoch i are
    # computed from the parameters ENTERING epoch i, i.e. produced by epoch
    # i-1's apply — a jump detected at i reverts to the best healthy snapshot.
    # On persistent instability the tripwire shrinks trust_scale, which the
    # host64 path below applies to the SR trust radius max_norm.
    from .tripwire import UpdateTripwire

    tripwire = UpdateTripwire(sigma=tripwire_sigma)

    def save_ckpt(i):
        if ckpt_every and is_main:
            import os
            import pickle

            with open(os.path.join(path, "ckpt_van.pkl"), "wb") as f:
                pickle.dump({"epoch": i,
                             "params_van": jax.device_get(params_van)}, f)

    for i in range(epoch_finished + 1, epoch + 1):
        tripwire.snapshot((params_van, opt_state))
        if host64:
            g, fisher_packed, key, aux = grads_and_fisher(params_van, key)
            uv, _ = host_solve_scaled(
                sym_unpack(jax.device_get(fisher_packed)), jax.device_get(g),
                damping, max_norm * tripwire.trust_scale,
            )
            if jax.process_count() > 1:
                # keep replicated params bitwise-identical across processes:
                # independent LAPACK solves can differ on heterogeneous
                # hosts, so broadcast process 0's update
                from jax.experimental import multihost_utils

                uv = np.asarray(multihost_utils.broadcast_one_to_all(
                    np.asarray(uv, np.float64)))
            params_van = apply_upd(params_van, replicate(jnp.asarray(uv, dtype), mesh))
        else:
            params_van, opt_state, key, aux = update(
                params_van, opt_state, key,
                jnp.asarray(tripwire.trust_scale, dtype))
        a = jax.device_get(aux)
        F_raw, F_err = float(a["F_mean"]), float(a["F_std"]) / sqrtb
        finite = all(math.isfinite(float(a[k])) for k in
                     ("F_mean", "E_mean", "S_mean", "F_std"))
        scale_before = tripwire.trust_scale
        revert_to = tripwire.check(F_raw, F_err, finite)
        if revert_to is not None:
            params_van, opt_state = revert_to
            print("TRIPWIRE epoch %d: F=%.6f +- %.6f (finite=%s) -> revert"
                  % (i, F_raw, F_err, finite))
            if tripwire.trust_scale != scale_before:
                print("TRIPWIRE: event burst -> trust radius scaled to %g"
                      % (max_norm * tripwire.trust_scale))
            continue
        if i % log_every == 0 and log is not None:
            log.write_pretrain(
                i,
                F_raw, F_err,
                float(a["E_mean"]), float(a["E_std"]) / sqrtb,
                float(a["S_mean"]), float(a["S_std"]) / sqrtb,
            )
        if ckpt_every and i % ckpt_every == 0:
            save_ckpt(i)
    save_ckpt(epoch)
    if log is not None:
        log.close()
    return params_van
