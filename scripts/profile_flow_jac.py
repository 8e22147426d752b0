"""A/B micro-benchmark of the flow-Jacobian variants on the MCMC hot path.

The Metropolis sampling phase evaluates logp = 2 Re log Psi on the full
batch once per sweep (50 sweeps per training step); its cost is dominated
by the flow Jacobian + log-dets.  This times, per variant, the jitted
full-batch logp (and the Jacobian alone), so regressions between the
carried-state recursion (ferminet_apply_and_jac), the structured depth-2
closure (ferminet_apply_and_jac_d2) and the batch-in-lanes Pallas kernel
(n <= 32) are measured instead of argued about.

    python scripts/profile_flow_jac.py --n 49 --batch 8192 [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *a, iters=5):
    import jax

    jax.block_until_ready(fn(*a))  # compile
    jax.block_until_ready(fn(*a))  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=49)
    p.add_argument("--Emax", type=int, default=36)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--chunk", type=int, default=None,
                   help="mc microbatch (make_logp_fast chunk)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import coulombgas_tpu as cg
    from coulombgas_tpu.models.ferminet_jac import (
        ferminet_apply_and_jac, ferminet_apply_and_jac_d2,
    )
    from coulombgas_tpu.wavefunction.fast_logp import make_logp_fast

    n, dim = args.n, 2
    L = float(np.sqrt(np.pi * n))
    sp_indices, _ = cg.sp_orbitals(dim, args.Emax)
    sp_twist, _ = cg.twist_sort(sp_indices, np.array([0.25, 0.25]))
    sp_twist = np.asarray(sp_twist[::-1].copy(), "float32")

    key = jax.random.PRNGKey(0)
    flow_cfg = cg.FermiNetConfig(2, 16, 16, L)
    params = cg.init_ferminet_params(key, flow_cfg, dim, jnp.float32)
    flow_apply = lambda p, xx: cg.ferminet_apply(p, flow_cfg, xx)

    x = jax.random.uniform(key, (args.batch, n, dim), jnp.float32, 0.0, L)
    si = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (args.batch, 1))

    variants = {
        "carried": lambda p, xx: ferminet_apply_and_jac(p, flow_cfg, xx),
        "structured_d2": lambda p, xx: ferminet_apply_and_jac_d2(p, flow_cfg, xx),
    }

    res = {}
    for name, jac in variants.items():
        jac_b = jax.jit(jax.vmap(lambda xx: jac(params, xx)[1]))
        res[name + "_jac"] = bench(jac_b, x, iters=args.iters)
        logp = make_logp_fast(flow_apply, sp_twist, L, chunk=args.chunk,
                              jacobian=jac)
        res[name + "_logp"] = bench(
            jax.jit(lambda xx, si: logp(xx, params, si)), x, si,
            iters=args.iters)

    if n <= 32:
        logp_k = make_logp_fast(flow_apply, sp_twist, L, chunk=args.chunk,
                                jacobian=lambda p, xx: ferminet_apply_and_jac_d2(p, flow_cfg, xx),
                                pallas_flow_cfg=flow_cfg)
        res["pallas_logp"] = bench(
            jax.jit(lambda xx, si: logp_k(xx, params, si)), x, si,
            iters=args.iters)

    print(json.dumps({k: round(v, 4) for k, v in res.items()}))


if __name__ == "__main__":
    main()
