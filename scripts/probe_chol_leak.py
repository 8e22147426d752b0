"""Forensic probe: why does the on-device chol SR solver leak entropy?

Round-4 evidence (VERDICT round 4, weak #1): resuming the converged n=29
rs=10 run (host64 solver, 3000 epochs, tail S ~= 4.5 matching the reference)
with ``--sr_solver chol`` drops the flow-block solve curvature
gnorm_flow = g^T M^{-1} g from ~8-10 to ~4.6 within a few epochs
(sr_diag.txt rows 3000-3010) and S drifts 4.49 -> 3.87 over 600 epochs at
flat F.  Candidate mechanisms, separated here on the REAL epoch-3000 state:

  A. the guarded-Cholesky ``bad`` branch (optim/sr.py:_solve_scaled) fires
     every step because the f32-centered quantum Fisher is numerically
     indefinite -> effective damping 33x the configured value;
  B. the f32 centering (qf - qsm qsm^T at apply time) itself is wrong
     (catastrophic cancellation) -> solving a different matrix;
  C. the f32 Cholesky solve (jacobi + 2 refinement rounds) is inaccurate
     even on the correctly-centered matrix.

Method: load data/interacting/<rs=10 run>/epoch_003000.pkl, draw one
production batch (2048 walkers, 50 Metropolis sweeps) on the chip, build the
accumulators exactly as the training step does, then compare

  * host-f64 LAPACK solve (the host64 reference answer),
  * device chol solve as the sweep ran it (jacobi=True, refine=2, chol=True),
    instrumented to report whether the boosted-damping refactor engaged,
  * the same solve with the boost suppressed,
  * min eigenvalue (f64 eigh on host) of the f32-centered vs f64-centered
    quantum Fisher.

Prints one JSON line with everything.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

RUN = ("data/interacting/n_29_dim_2_rs_10.0_Theta_0.15_Emax_25_twist_0.250_"
       "0.250_nlayers_2_modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_"
       "tpsize_16_Gmax_15_kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_"
       "hutchinson_damping_0.00100_maxnorm_0.00100_batch_2048_ndevices_1_"
       "accsteps_4")


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(RUN, "epoch_003000.pkl"))
    ap.add_argument("--acc_steps", type=int, default=4,
                    help="accumulation steps (production: 4)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import scipy.linalg as sla
    from jax.flatten_util import ravel_pytree

    import __graft_entry__ as ge
    from coulombgas_tpu.io.checkpoint import load_data
    from coulombgas_tpu.optim.host_sr import host_hybrid_apply
    from coulombgas_tpu.optim.sr import _solve_scaled

    print("backend:", jax.default_backend(), file=sys.stderr)
    parts = ge._build_stack(n=29, dim=2, Emax=25, batch=2048, hutchinson=True,
                            sr=True, mc_steps=50, microbatch=None)
    ckpt = load_data(args.ckpt)
    f32 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    params_van, params_flow = f32(ckpt["params_van"]), f32(ckpt["params_flow"])
    x = jnp.asarray(ckpt["x"], jnp.float32)
    key = jnp.asarray(ckpt["key"])

    sample_jit = jax.jit(parts["sample_step"])
    accumulate_jit = jax.jit(parts["accumulate"])
    acc = parts["init_acc"]()
    # same structure/params, but zero accumulators built for the ckpt params
    from coulombgas_tpu.train.train import init_accumulators
    acc = init_accumulators(params_van, params_flow, True, jnp.float32)
    for _ in range(args.acc_steps):
        key, ks, ku = jax.random.split(key, 3)
        si, x, ar = sample_jit(params_van, params_flow, x, ks)
        acc = accumulate_jit(params_van, params_flow, si, x, ku, acc)
    jax.block_until_ready(acc)
    print("accept_rate last:", float(ar), file=sys.stderr)

    K = args.acc_steps
    damping, max_norm = 1e-3, 1e-3

    # ---- host-f64 reference answer ---------------------------------------
    acc_host = jax.tree.map(lambda a: np.asarray(a), acc)
    uv64, uf64, data, diag64 = host_hybrid_apply(acc_host, K, damping, max_norm)

    # ---- device-path f32 pre-solve math (exactly apply_update's) ---------
    norm = lambda t: jax.tree.map(lambda a: a / K, t)
    d = norm(acc["data"])
    grad_van, grad_flow = norm(acc["grads"])
    cs, qs = norm(acc["classical_score"]), norm(acc["quantum_score"])
    grad_van = jax.tree.map(lambda g, s: g - d["F_mean"] * s, grad_van, cs)
    grad_flow = jax.tree.map(lambda g, s: g - d["E_mean"] * s, grad_flow, qs)
    gv = ravel_pytree(grad_van)[0]
    gf = ravel_pytree(grad_flow)[0]
    cf = acc["classical_fisher"] / K
    qf_raw = acc["quantum_fisher"] / K
    qsm2 = acc["quantum_score_mean"] / K
    # f32 centering in real parts (complex arrays are unimplemented on the
    # axon tunnel): Re(conj(m) m^T) = m_r m_r^T + m_i m_i^T
    qf_f32 = qf_raw - (qsm2[0][:, None] * qsm2[0][None, :]
                       + qsm2[1][:, None] * qsm2[1][None, :])

    out = {"acc_steps": K, "accept": float(ar),
           "F_mean": float(d["F_mean"]), "S_mean": float(d["S_mean"])}

    # ---- A: does the bad branch fire?  (replicate _solve_scaled chol path)
    def bad_probe(M, g):
        dtype = M.dtype
        Md = M + damping * jnp.eye(M.shape[0], dtype=dtype)
        s = jax.lax.rsqrt(jnp.diagonal(Md))
        Ms = Md * s[:, None] * s[None, :]
        c = jax.scipy.linalg.cholesky(Ms, lower=True)
        return ~jnp.all(jnp.isfinite(c))

    bad_flow = bool(jax.jit(bad_probe)(qf_f32, gf))
    bad_van = bool(jax.jit(bad_probe)(cf, gv))
    out["bad_fires_flow"] = bad_flow
    out["bad_fires_van"] = bad_van

    # ---- device chol solves (as the sweep ran), and with boost suppressed -
    solve = jax.jit(lambda M, g: _solve_scaled(
        M, g, damping, max_norm, refine=2, jacobi=True, chol=True,
        with_diag=True))
    uv32, dv = solve(cf, gv)
    uf32, df = solve(qf_f32, gf)
    out["gnorm_van_chol"] = float(dv["gnorm"])
    out["gnorm_flow_chol"] = float(df["gnorm"])
    out["gnorm_van_host64"] = float(diag64["gnorm_van"])
    out["gnorm_flow_host64"] = float(diag64["gnorm_flow"])

    rel = lambda a, b: float(np.linalg.norm(np.asarray(a, np.float64) - b)
                             / max(np.linalg.norm(b), 1e-300))
    out["rel_err_upd_van"] = rel(uv32, uv64)
    out["rel_err_upd_flow"] = rel(uf32, uf64)

    # chol with 33x damping (what the bad branch effectively solves)
    uf_boost, dfb = solve(qf_f32 + 32.0 * damping
                          * jnp.eye(qf_f32.shape[0], dtype=jnp.float32), gf)
    out["gnorm_flow_chol_boosted"] = float(dfb["gnorm"])

    # ---- B: centering precision -------------------------------------------
    qf64_raw = np.asarray(qf_raw, np.float64)
    qsm64 = np.asarray(qsm2, np.float64)
    qsmc = qsm64[0] + 1j * qsm64[1]
    qf_f64 = qf64_raw - np.real(np.conj(qsmc)[:, None] * qsmc[None, :])
    evals64 = sla.eigvalsh(qf_f64)
    evals32 = sla.eigvalsh(np.asarray(qf_f32, np.float64))
    out["qf_mineig_f64center"] = float(evals64[0])
    out["qf_mineig_f32center"] = float(evals32[0])
    out["qf_maxeig"] = float(evals64[-1])
    out["qf_center_rel_diff"] = float(
        np.linalg.norm(np.asarray(qf_f32, np.float64) - qf_f64)
        / np.linalg.norm(qf_f64))

    # ---- C: f64 solve on the f32-centered matrix (isolates solve accuracy)
    M = qf_f64 + damping * np.eye(qf_f64.shape[0])
    delta = sla.solve(M, np.asarray(gf, np.float64), assume_a="sym")
    gnorm = float(np.asarray(gf, np.float64) @ delta)
    out["gnorm_flow_f64solve_on_f32grads"] = gnorm

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
