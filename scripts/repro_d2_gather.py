"""Hardware compile + accuracy probe for the d2 Pallas flow kernels.

Round-4 chip A/B: every flow_u_jac_pallas_d2 / flow_u_jac_lap_pallas_d2
variant failed to lower on the real TPU with "Only 2D gather is supported"
(the kernels had only ever run in interpret mode — VERDICT r3 weak #2).
Commit ba0e555 rewrote the 8 newaxis-mixed getitems as slice-then-newaxis;
this script decides promote-or-cull: it compiles both kernels on the real
backend at a small n AND at the production n=57 shape, checks the outputs
against the XLA reference path, and exits nonzero on any failure so the
chip queue can gate the full A/B on it.

Usage:  JAX_TRACEBACK_FILTERING=off python scripts/repro_d2_gather.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("backend:", jax.default_backend())

    import coulombgas_tpu as cg
    from coulombgas_tpu.models.ferminet_jac import ferminet_apply_jac_lap_d2
    from coulombgas_tpu.ops.pallas_flow_jac import (
        flow_u_jac_pallas_d2, flow_u_jac_lap_pallas_d2,
    )

    failures = 0
    for n, B in ((13, 128), (57, 64)):
        dim = 2
        L = float(jnp.sqrt(jnp.pi * n))
        cfg = cg.FermiNetConfig(2, 16, 16, L)
        key = jax.random.PRNGKey(n)
        params = cg.init_ferminet_params(key, cfg, dim, jnp.float32)
        x = jax.random.uniform(key, (B, n, dim), jnp.float32, 0.0, L)

        # XLA oracles (per-walker closures, vmapped)
        u_r, J_r = jax.jit(jax.vmap(
            lambda q: cg.ferminet_apply_and_jac(params, cfg, q)))(x)
        _, _, lap_r = jax.jit(jax.vmap(
            lambda q: ferminet_apply_jac_lap_d2(params, cfg, q)))(x)

        for name, fn, nout in (("fwd+jac", flow_u_jac_pallas_d2, 2),
                               ("fwd+jac+lap", flow_u_jac_lap_pallas_d2, 3)):
            print(f"--- n={n} {name} ---")
            try:
                out = jax.jit(lambda xx: fn(params, cfg, xx))(x)
                jax.block_until_ready(out)
                print(f"{name}: compiled OK", [o.shape for o in out])
                # kernel outputs are batch-in-lanes: batch axis LAST
                u_t = np.moveaxis(np.asarray(out[0]), -1, 0)
                J_t = np.moveaxis(np.asarray(out[1]), -1, 0)
                err_u = float(np.max(np.abs(u_t - np.asarray(u_r))))
                err_j = float(np.max(np.abs(J_t - np.asarray(J_r))))
                print(f"{name}: max|u-ref| {err_u:.3e}  max|jac-ref| {err_j:.3e}")
                ok = err_u < 1e-3 and err_j < 1e-3
                if nout == 3:
                    lap_t = np.moveaxis(np.asarray(out[2]), -1, 0)
                    err_l = float(np.max(np.abs(lap_t - np.asarray(lap_r))))
                    print(f"{name}: max|lap-ref| {err_l:.3e}")
                    ok = ok and err_l < 5e-2
                if not ok:
                    print(f"{name}: ACCURACY FAIL at n={n}")
                    failures += 1
            except Exception:
                import traceback

                traceback.print_exc()
                failures += 1

    print("RESULT:", "ok" if failures == 0 else f"{failures} failures")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
