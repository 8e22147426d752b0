"""Minimal repro of the d2 Pallas kernel's Mosaic lowering failure.

Round-4 chip A/B: every flow_u_jac_pallas_d2 / flow_u_jac_lap_pallas_d2
variant fails to lower on the real TPU with "Only 2D gather is supported"
(the kernels had only ever run in interpret mode — VERDICT r3 weak #2).
This script compiles ONE tiny d2 call with full tracebacks to locate the
offending op, at n small enough that compile is fast.

Usage:  JAX_TRACEBACK_FILTERING=off python scripts/repro_d2_gather.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend())

    from coulombgas_tpu.models.ferminet import FermiNetConfig, init_ferminet_params
    from coulombgas_tpu.ops.pallas_flow_jac import (
        flow_u_jac_pallas_d2, flow_u_jac_lap_pallas_d2,
    )

    n, dim, B = 13, 2, 128
    L = float(jnp.sqrt(jnp.pi * n))
    cfg = FermiNetConfig(depth=2, spsize=16, tpsize=16, L=L)
    params = init_ferminet_params(jax.random.PRNGKey(0), cfg, dim=dim)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, n, dim), jnp.float32, 0.0, L)

    for name, fn in (("fwd+jac", flow_u_jac_pallas_d2),
                     ("fwd+jac+lap", flow_u_jac_lap_pallas_d2)):
        print(f"--- {name} ---")
        try:
            out = jax.jit(lambda xx: fn(params, cfg, xx))(x)
            jax.block_until_ready(out)
            print(f"{name}: OK", [o.shape for o in out])
        except Exception:
            import traceback

            traceback.print_exc()


if __name__ == "__main__":
    main()
