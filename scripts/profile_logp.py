"""Micro-profile of the MCMC logp = 2 Re log Psi, term by term.

logp per walker = 2 Re log det D(flow(x)) + log |det d flow/dx|.
Times, at the production batch (8192, n=13):

    flow_fwd      FermiNet forward alone
    slater        flow fwd + complex n x n slogdet
    jac_only      flow Jacobian via jacfwd (nd tangents), no determinant
    jacdet        flow Jacobian + real nd x nd slogdet
    logp_full     the production make_logp path
"""

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, *a, iters=5):
    import jax

    fn(*a)  # compile
    jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=13)
    p.add_argument("--Emax", type=int, default=25)
    p.add_argument("--batch", type=int, default=8192)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import coulombgas_tpu as cg
    from coulombgas_tpu.models.slater import logslaterdet

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

    logpsi_novmap = cg.make_logpsi(flow_apply, sp_twist, L)
    logp = cg.make_logp(logpsi_novmap)

    nd = n * dim

    def jac_one(xx):
        flat = lambda xf: flow_apply(params, xf.reshape(n, dim)).reshape(-1)
        return jax.jacfwd(flat)(xx.reshape(-1))

    def slater_one(xx, idx):
        z = flow_apply(params, xx)
        return logslaterdet(jnp.asarray(sp_twist)[idx], z, L).real

    res = {
        "flow_fwd": bench(jax.jit(jax.vmap(lambda xx: flow_apply(params, xx))), x),
        "slater": bench(jax.jit(jax.vmap(slater_one, (0, 0))), x, si),
        "jac_only": bench(jax.jit(jax.vmap(jac_one)), x),
        "jacdet": bench(
            jax.jit(jax.vmap(lambda xx: jnp.linalg.slogdet(jac_one(xx))[1])), x
        ),
        "logp_full": bench(jax.jit(lambda xx: logp(xx, params, si)), x),
    }
    print(json.dumps({k: round(v, 4) for k, v in res.items()}))


if __name__ == "__main__":
    main()
