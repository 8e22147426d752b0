"""A/B: carried-state vs depth-2 closed-form flow Jacobian, end-to-end.

Round-2's flagship perf item (the d2 closure, commits d368a68/bc4b00d) cut
XLA-counted FLOPs ~4x but BENCH_r02 regressed 15-25% at every config vs
BENCH_r01 (VERDICT round 2, weak #1).  This script measures BOTH paths with
the exact bench.py harness (full production training step, per-phase timing)
at all three benched configs, so the default in select_flow_jac is a
measurement, not a story.

Usage:  python scripts/bench_flow_jac_ab.py [--iters 5]
Prints one JSON line per (config, impl).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of config names (default: all in bench.CONFIGS)")
    ap.add_argument("--impls", nargs="*", default=None,
                    help="explicit impl list (default: carried + the kernels)")
    args = ap.parse_args()

    results = {}
    # n49 first: it is the config the kernel decision actually hinges on
    # (the n>=49 sampling wall), so a chip-window cutoff still yields the
    # decisive rows.  Rows print as they complete.
    order = sorted(bench.CONFIGS, key=lambda c: 0 if "n49" in c[0] else 1)
    for name, cfg in order:
        if args.configs and name not in args.configs:
            continue
        # 'd2k' = carried jnp path for the AD phases + the single-kernel
        # depth-2 structured-closure Pallas flow fwd+jac in the MCMC logp
        # (ops/pallas_flow_jac.py:flow_u_jac_pallas_d2) — the round-3
        # candidate for the n >= 49 sampling wall.
        # decision-critical only: carried baseline + the round-3 kernels.
        # The XLA d2 closure needs no re-measurement — BENCH_r02 already IS
        # its end-to-end number at all three configs (PERF.md round-2
        # section); pass --impls d2 to re-run it explicitly.
        impls = args.impls or ["carried", "d2k", "accd2k", "d2k+accd2k"]
        if cfg.get("mc_microbatch") and args.impls is None:
            # the MCMC batch chunking only bounds the XLA fallback's Jacobian
            # fan-out; the d2 kernel streams in VMEM and needs no chunking
            impls[2:2] = ["d2k_nochunk", "d2k_nochunk+accd2k"]
        for impl in impls:
            if impl == "d2k":
                full = dict(cfg, flow_jac_impl="carried", mc_d2_kernel=True)
            elif impl == "d2k_nochunk":
                full = dict(cfg, flow_jac_impl="carried", mc_d2_kernel=True)
                full.pop("mc_microbatch", None)
            elif impl == "d2k_nochunk+accd2k":
                full = dict(cfg, flow_jac_impl="carried", mc_d2_kernel=True,
                            acc_d2_kernel=True)
                full.pop("mc_microbatch", None)
            elif impl == "accd2k":
                # batched Pallas jac+lap kernel serving the accumulate
                # phase's primal flow slot (fast_laplacian.py)
                full = dict(cfg, flow_jac_impl="carried", acc_d2_kernel=True)
            elif impl == "d2k+accd2k":
                full = dict(cfg, flow_jac_impl="carried", mc_d2_kernel=True,
                            acc_d2_kernel=True)
            else:
                full = dict(cfg, flow_jac_impl=impl)
            try:
                dt, phases = bench.bench_config(full, iters=args.iters)
                row = {"s_per_step": round(dt, 4), **phases}
            except Exception as e:
                row = {"error": str(e)[:200]}
            results["%s/%s" % (name, impl)] = row
            print(json.dumps({"config": name, "impl": impl, **row}), flush=True)

    print(json.dumps({"metric": "flow_jac_ab", "detail": results}))


if __name__ == "__main__":
    main()
