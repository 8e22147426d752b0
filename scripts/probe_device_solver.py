"""Chip probe: can the guarded-Cholesky SR solver replace host64 on-device?

Three questions, answered on the real TPU in a few minutes:

1. Does ``_solve_scaled(..., chol=True)`` COMPILE and RUN at production P
   (n=49 stage-1: P=6402; n=57: P=7050)?  The LU-refined path crashed the
   XLA TPU compiler at these sizes (data/parity_n49_refined.log), which is
   why the host64 solver exists at all.
2. How accurate is it vs the host-f64 LAPACK solve on the SAME matrix?
3. What does it cost per apply step vs host64's device->host Fisher pull
   (which measured ~54 s at n=13 on round 4's slow tunnel)?

Also measures the raw D2H bandwidth so the host64 cost model stays honest.

Usage:  python scripts/probe_device_solver.py [--sizes 6402 7050]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[6402, 7050])
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from coulombgas_tpu.optim.sr import _solve_scaled

    print("backend:", jax.default_backend(), jax.devices())
    out = {"backend": jax.default_backend()}

    # ---- raw D2H bandwidth --------------------------------------------------
    mb = 64
    buf = jnp.ones((mb * 1024 * 1024 // 4,), jnp.float32)
    jax.block_until_ready(buf)
    t0 = time.perf_counter()
    np.asarray(buf)
    dt = time.perf_counter() - t0
    out["d2h_MB_per_s"] = round(mb / dt, 2)
    print(f"D2H: {mb} MiB in {dt:.2f}s = {mb/dt:.1f} MB/s")

    for P in args.sizes:
        key = jax.random.PRNGKey(0)
        scores = jax.random.normal(key, (args.batch, P), jnp.float32) / np.sqrt(P)
        # block-scale the scores so the Fisher has the production-style
        # diagonal spread the Jacobi scaling exists for
        d = 10.0 ** jnp.linspace(-2, 2, P)
        scores = scores * d[None, :]
        fisher = scores.T @ scores / args.batch
        grad = jax.random.normal(jax.random.PRNGKey(1), (P,), jnp.float32) * 1e-3
        jax.block_until_ready((fisher, grad))

        solve = jax.jit(lambda F, g: _solve_scaled(
            F, g, damping=1e-3, max_norm=1e-3, jacobi=True, refine=2, chol=True))
        row = {}
        try:
            t0 = time.perf_counter()
            u = solve(fisher, grad)
            jax.block_until_ready(u)
            row["compile_plus_first_s"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            iters = 3
            for _ in range(iters):
                u = solve(fisher, grad)
            jax.block_until_ready(u)
            row["solve_s"] = round((time.perf_counter() - t0) / iters, 4)
            row["finite"] = bool(jnp.all(jnp.isfinite(u)))

            # accuracy vs host f64 on the same matrix
            F64 = np.asarray(fisher, np.float64)
            g64 = np.asarray(grad, np.float64)
            import scipy.linalg as sla
            M = F64 + 1e-3 * np.eye(P)
            delta = sla.solve(M, g64, assume_a="pos")
            gnorm = float(g64 @ delta)
            scale = min(np.sqrt(1e-3 / gnorm), 1.0) if gnorm > 0 else 0.0
            want = -scale * delta
            got = np.asarray(u, np.float64)
            rel = float(np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-300))
            row["rel_err_vs_host64"] = rel
            print(f"P={P}: compile+1st {row['compile_plus_first_s']}s, "
                  f"steady {row['solve_s']}s, rel_err {rel:.2e}, "
                  f"finite={row['finite']}")
        except Exception as e:
            row["error"] = str(e)[:500]
            print(f"P={P}: FAILED: {str(e)[:200]}")
        out[f"P{P}"] = row

    print(json.dumps(out))


if __name__ == "__main__":
    main()
