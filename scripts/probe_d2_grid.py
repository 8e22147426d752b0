"""Hardware probe for the grid-accumulation d2 flow fwd+jac (round 4).

The mono-kernel d2 failed AOT compilation at n=57 with ~340 MB of register
spill slots (PERF.md round-4); the grid rewrite moves the streamed chunk
axes into the Pallas grid so each step's live set is one chunk.  This
script is the promote-or-park gate for the rewrite: compile + run
``flow_u_jac_pallas_d2`` on the real backend at n = 13, 49, 57, check
against the XLA oracle, and time the kernel against the carried-state XLA
path at the production MCMC shapes.  Exits nonzero on any failure.

Usage:  python scripts/probe_d2_grid.py [--iters 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bench_batch", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.default_backend())

    import coulombgas_tpu as cg
    from coulombgas_tpu.ops.pallas_flow_jac import flow_u_jac_pallas_d2

    failures = 0
    for n, B in ((13, 128), (49, 64), (57, 64)):
        dim = 2
        L = float(jnp.sqrt(jnp.pi * n))
        cfg = cg.FermiNetConfig(2, 16, 16, L)
        key = jax.random.PRNGKey(n)
        params = cg.init_ferminet_params(key, cfg, dim, jnp.float32)
        x = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)

        u_r, J_r = jax.jit(jax.vmap(
            lambda q: cg.ferminet_apply_and_jac(params, cfg, q)))(x)

        print(f"--- n={n} grid fwd+jac ---")
        try:
            out = jax.jit(lambda xx: flow_u_jac_pallas_d2(params, cfg, xx))(x)
            jax.block_until_ready(out)
            print("compiled OK", [o.shape for o in out])
            u_t = np.moveaxis(np.asarray(out[0]), -1, 0)
            J_t = np.moveaxis(np.asarray(out[1]), -1, 0)
            err_u = float(np.max(np.abs(u_t - np.asarray(u_r))))
            err_j = float(np.max(np.abs(J_t - np.asarray(J_r))))
            print(f"max|u-ref| {err_u:.3e}  max|jac-ref| {err_j:.3e}")
            if not (err_u < 1e-4 and err_j < 1e-6):
                print("ACCURACY FAIL")
                failures += 1
        except Exception as e:  # noqa: BLE001 — a compile failure IS the result
            print("FAILED:", type(e).__name__, str(e)[:2000])
            failures += 1
            continue

        # timing at the production MCMC shape: kernel vs the carried XLA path
        Bb = args.bench_batch
        xb = jax.random.uniform(key, (Bb, n, dim), jnp.float32, 0.0, L)
        kfn = jax.jit(lambda xx: flow_u_jac_pallas_d2(params, cfg, xx))
        cfn = jax.jit(jax.vmap(lambda q: cg.ferminet_apply_and_jac(params, cfg, q)))
        for name, fn in (("grid-d2", kfn), ("carried-xla", cfn)):
            try:
                jax.block_until_ready(fn(xb))
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fn(xb)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / args.iters
                print(f"{name}: batch {Bb}: {dt * 1e3:.2f} ms/call")
            except Exception as e:  # noqa: BLE001
                print(f"{name}: bench failed: {type(e).__name__} {str(e)[:500]}")
                if name == "grid-d2":
                    failures += 1

    print("RESULT:", "ok" if failures == 0 else f"{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
