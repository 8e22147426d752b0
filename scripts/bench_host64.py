"""Standalone host64 apply-step benchmark at an arbitrary (n, Emax, batch).

Measures ONLY the production host-f64 SR apply pipeline (pack -> async D2H
-> pipelined fetch+LAPACK solves -> update push), the part bench.py's full
configs cover at n=13/49/57 but not at n=29 — the shape the converged
stage-2 parity runs actually used (VERDICT r2 #7).

Usage:  python scripts/bench_host64.py --n 29 --Emax 25 --batch 2048 [--iters 3]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=29)
    ap.add_argument("--Emax", type=int, default=25)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--microbatch", type=int, default=None)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from jax.flatten_util import ravel_pytree

    from coulombgas_tpu.optim.host_sr import host_hybrid_apply, sym_pack

    cfg = dict(n=args.n, Emax=args.Emax, batch=args.batch)
    if args.microbatch:
        cfg["microbatch"] = args.microbatch
    parts, sample_jit, accumulate_jit, _ = bench.build(cfg)
    params_van, params_flow = parts["params_van"], parts["params_flow"]
    x, key = parts["x"], parts["key"]

    key, k1, k2 = jax.random.split(key, 3)
    si, x, _ = bench._retry(sample_jit, params_van, params_flow, x, k1)
    acc = bench._retry(
        accumulate_jit, params_van, params_flow, si, x, k2, parts["init_acc"]()
    )
    jax.block_until_ready(acc["data"]["F_mean"])

    _, unravel_van = ravel_pytree(params_van)
    _, unravel_flow = ravel_pytree(params_flow)
    apply_host_jit = jax.jit(lambda pv, pf, uv, uf: (
        optax.apply_updates(pv, unravel_van(uv)),
        optax.apply_updates(pf, unravel_flow(uf)),
    ))
    pack_acc_jit = jax.jit(lambda a: dict(
        a,
        classical_fisher=sym_pack(a["classical_fisher"]),
        quantum_fisher=sym_pack(a["quantum_fisher"]),
    ))

    P = acc["classical_fisher"].shape[0]
    Q = acc["quantum_fisher"].shape[0]
    times = {"pull_solve": 0.0, "push_apply": 0.0}
    for it in range(args.iters + 1):  # first iteration = compile warmup
        t0 = time.perf_counter()
        packed = pack_acc_jit(acc)
        try:
            packed["classical_fisher"].copy_to_host_async()
            for k in sorted(packed):
                if k not in ("classical_fisher", "quantum_fisher"):
                    for leaf in jax.tree.leaves(packed[k]):
                        leaf.copy_to_host_async()
            packed["quantum_fisher"].copy_to_host_async()
        except Exception:
            pass
        uv, uf, _, _ = host_hybrid_apply(packed, 1, 1e-3, 1e-3)
        t2 = time.perf_counter()
        pv, pf = bench._retry(
            apply_host_jit, params_van, params_flow,
            jnp.asarray(uv, parts["rdtype"]), jnp.asarray(uf, parts["rdtype"]),
        )
        jax.block_until_ready(pv)
        t3 = time.perf_counter()
        if it > 0:
            times["pull_solve"] += t2 - t0
            times["push_apply"] += t3 - t2

    out = {
        "metric": "host64_apply_n%d_batch%d" % (args.n, args.batch),
        "value": round(sum(times.values()) / args.iters, 4),
        "unit": "s/apply",
        "detail": {
            "P_classical": int(P), "P_quantum": int(Q),
            **{k: round(v / args.iters, 4) for k, v in times.items()},
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
