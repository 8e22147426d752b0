"""Per-phase profiling of the production VMC training step on the local chip.

Breaks the bench.py configuration (n=13, batch 8192, Hutchinson, SR) into its
phases and times each jitted program separately with device sync:

    sampler        VAN KV-cached occupation draws
    mcmc           50 Metropolis sweeps (each = one batched logp)
    logp_once      a single batched logp evaluation (mcmc ~= 50x this)
    accumulate     observables + REINFORCE grads + scores (+ Fisher terms)
    fishers        the SR Fisher build alone
    apply          normalization + SR solves + parameter update

Usage: python scripts/profile_step.py [--n 13] [--batch 8192] [--trace DIR]
With --trace, a jax.profiler trace of one full step is written for
TensorBoard (utils/profiling.trace).
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=13)
    p.add_argument("--Emax", type=int, default=25)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--mc_steps", type=int, default=50)
    p.add_argument("--microbatch", type=int, default=2048)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--trace", default=None, help="profiler trace output dir")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    import __graft_entry__ as ge
    from coulombgas_tpu.sampling.mcmc import mcmc
    from coulombgas_tpu.utils.profiling import StepTimer, annotate, trace

    parts = ge._build_stack(
        n=args.n, dim=2, Emax=args.Emax, batch=args.batch, hutchinson=True,
        sr=True, mc_steps=args.mc_steps, microbatch=args.microbatch,
    )
    params_van, params_flow = parts["params_van"], parts["params_flow"]
    opt_state, x, key = parts["opt_state"], parts["x"], parts["key"]
    print("P_van =", ravel_pytree(params_van)[0].size,
          " P_flow =", ravel_pytree(params_flow)[0].size, file=sys.stderr)

    # rebuild the pieces _build_stack wires together, to time them separately
    import coulombgas_tpu as cg

    sample_jit = jax.jit(parts["sample_step"])
    accumulate_jit = jax.jit(parts["accumulate"])
    apply_jit = jax.jit(parts["apply_update"])

    sampler, log_prob_novmap = cg.make_autoregressive_sampler(
        cg.TransformerConfig(parts_num_states(parts, args), 2, 16, 4, 32),
        _sp_twist(args), args.n, parts_num_states(parts, args),
    )

    state_indices = sample_jit(params_van, params_flow, x, key)[0]
    state_indices = jax.block_until_ready(state_indices)

    flow_cfg = cg.FermiNetConfig(2, 16, 16, _L(args.n))
    flow_apply = lambda p, xx: cg.ferminet_apply(p, flow_cfg, xx)
    logpsi_novmap = cg.make_logpsi(flow_apply, _sp_twist(args), _L(args.n))
    logp = cg.make_logp(logpsi_novmap)

    sampler_jit = jax.jit(lambda pv, k: sampler(pv, k, args.batch))
    logp_jit = jax.jit(lambda xx, pf, si: logp(xx, pf, si))
    mcmc_jit = jax.jit(
        lambda pf, si, xx, k: mcmc(
            lambda q: logp(q, pf, si), xx, k, args.mc_steps, 0.1
        )
    )

    from coulombgas_tpu.optim.sr import hybrid_fisher_sr

    classical_score_fn = cg.make_classical_score(log_prob_novmap)
    quantum_score_fn = cg.make_quantum_score(logpsi_novmap)
    sr_opt = hybrid_fisher_sr(classical_score_fn, quantum_score_fn, 1e-3, 1e-3)
    fishers_jit = jax.jit(sr_opt.fishers)

    timers = {k: StepTimer(warmup=1) for k in
              ("sampler", "mcmc", "logp_once", "accumulate", "fishers", "apply", "full_step")}

    def run_once():
        nonlocal x, key, opt_state
        key, k1, k2, k3 = jax.random.split(key, 4)
        with timers["sampler"].step() as o:
            o["sync"] = sampler_jit(params_van, k1)
        si = o["sync"]
        with timers["logp_once"].step() as o:
            o["sync"] = logp_jit(x, params_flow, si)
        with timers["mcmc"].step() as o:
            o["sync"] = mcmc_jit(params_flow, si, x, k2)
        xs = o["sync"][0]
        acc = parts["init_acc"]()
        with timers["accumulate"].step() as o:
            o["sync"] = accumulate_jit(params_van, params_flow, si, xs, k3, acc)
        acc = o["sync"]
        # fishers on one microbatch chunk (the production accumulate runs it
        # per-chunk inside the scan; full-batch would OOM standalone)
        with timers["fishers"].step() as o:
            o["sync"] = fishers_jit(
                params_van, params_flow, si[: args.microbatch], xs[: args.microbatch]
            )
        with timers["apply"].step() as o:
            o["sync"] = apply_jit(params_van, params_flow, opt_state, acc)
        # full production step, end to end
        with timers["full_step"].step() as o:
            si2, xn, ar = sample_jit(params_van, params_flow, x, k2)
            acc2 = accumulate_jit(params_van, params_flow, si2, xn, k3, parts["init_acc"]())
            o["sync"] = apply_jit(params_van, params_flow, opt_state, acc2)
        x = xs

    for _ in range(args.iters + 1):
        run_once()

    if args.trace:
        with trace(args.trace):
            with annotate("profile_full_step"):
                run_once()

    out = {k: round(t.summary().get("mean_s", float("nan")), 4) for k, t in timers.items()}
    print(json.dumps(out))


def _L(n):
    import numpy as np

    return float(np.sqrt(np.pi * n))


def _sp_twist(args):
    import numpy as np

    import coulombgas_tpu as cg

    sp_indices, _ = cg.sp_orbitals(2, args.Emax)
    sp_twist, _ = cg.twist_sort(sp_indices, np.array([0.25, 0.25]))
    return np.asarray(sp_twist[::-1].copy(), "float32")


def parts_num_states(parts, args):
    import coulombgas_tpu as cg

    return cg.sp_orbitals(2, args.Emax)[1].size


if __name__ == "__main__":
    main()
