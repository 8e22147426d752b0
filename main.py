"""Finite-temperature VMC for the homogeneous electron gas — training driver.

TPU-native rebuild of the reference CLI (reference main.py): identical flag
surface, run-directory naming and data.txt format, with the compute path
redesigned for TPU:

  * one jitted global-batch program over a 1-D ``Mesh(('dp',))`` — batch
    arrays sharded over devices, parameters replicated; collectives are
    inserted by XLA over ICI (no pmap, no explicit pmean);
  * f32/c64 on TPU (f64 on CPU), validated against the mpmath oracle;
  * KV-cached O(n) autoregressive sampling;
  * accumulate/apply split so the big AD graph compiles once.

Example (demo config, reference README):
  python main.py --n 13 --dim 2 --rs 10.0 --Theta 0.15 --Emax 25 \
      --batch 256 --epoch 100 --acc_steps 1 --folder /tmp/coulombgas/
"""

import argparse
import os
import time


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Finite-temperature VMC for the homogeneous electron gas (TPU-native)"
    )
    parser.add_argument("--folder", default="./data/", help="the folder to save data")

    # physical parameters
    parser.add_argument("--n", type=int, default=29, help="total number of electrons")
    parser.add_argument("--dim", type=int, default=2, help="spatial dimension")
    parser.add_argument("--rs", type=float, default=10.0, help="rs")
    parser.add_argument("--Theta", type=float, default=0.15, help="dimensionless temperature T/Ef")
    parser.add_argument("--twist", type=float, nargs="+", default=[1 / 4, 1 / 4],
                        help="(scaled) twist angle in [-1/2, 1/2]^dim")

    # autoregressive transformer
    parser.add_argument("--Emax", type=int, default=25, help="single-particle energy cutoff")
    parser.add_argument("--nlayers", type=int, default=2)
    parser.add_argument("--modelsize", type=int, default=16)
    parser.add_argument("--nheads", type=int, default=4)
    parser.add_argument("--nhidden", type=int, default=32)

    # normalizing flow
    parser.add_argument("--depth", type=int, default=2)
    parser.add_argument("--spsize", type=int, default=16)
    parser.add_argument("--tpsize", type=int, default=16)

    # Ewald
    parser.add_argument("--Gmax", type=int, default=15)
    parser.add_argument("--kappa", type=int, default=10)

    # MCMC
    parser.add_argument("--mc_therm", type=int, default=10)
    parser.add_argument("--mc_steps", type=int, default=50)
    parser.add_argument("--mc_stddev", type=float, default=0.1)

    # technical
    parser.add_argument("--hutchinson", action="store_true",
                        help="Hutchinson estimate of the flow-Jacobian Laplacian")
    parser.add_argument("--forloop_laplacian", action="store_true",
                        help="sequential Hessian columns (less memory) instead of batched")
    parser.add_argument("--laplacian", choices=["analytic", "ad"], default="analytic",
                        help="Slater-part Laplacian: closed-form plane-wave identities "
                             "(fast path, O(dim n^3)) or generic forward-over-reverse AD")
    parser.add_argument("--slow_logp", action="store_true",
                        help="use the slogdet-based MCMC density instead of the "
                             "Gram-Cholesky fast path")
    parser.add_argument("--mc_microbatch", type=int, default=0,
                        help="batch-chunk size for the MCMC logp (bounds the "
                             "Jacobian fan-out HBM peak at large n; 0 = whole batch)")
    parser.add_argument("--flow_jac", choices=["auto", "carried", "d2"], default="auto",
                        help="flow Jacobian implementation: 'carried' layer-recursive "
                             "dense state, 'd2' depth-2 closed form, 'auto' the "
                             "measured-faster default (see PERF.md)")
    parser.add_argument("--mc_d2_kernel", action="store_true",
                        help="use the single-kernel depth-2 structured-closure "
                             "Pallas flow fwd+jac in the MCMC logp (opt-in; "
                             "chip-validated at n <= 13, measured-negative at "
                             "n >= 49: Mosaic register-spill VMEM OOM — "
                             "PERF.md round-4)")
    parser.add_argument("--acc_d2_kernel", action="store_true",
                        help="serve the accumulate phase's primal flow "
                             "fwd+jac+laplacian from the batched Pallas d2 "
                             "kernel (depth-2, analytic laplacian path only; "
                             "opt-in; chip-validated at n <= 13, "
                             "measured-negative at n >= 49 — PERF.md round-4)")

    # optimizer
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--sr", action="store_true", help="stochastic reconfiguration")
    parser.add_argument("--damping", type=float, default=1e-3)
    parser.add_argument("--max_norm", type=float, default=1e-3)
    parser.add_argument("--sr_solver", choices=["plain", "refined", "chol", "host64"], default="plain",
                        help="SR dense-solve variant: plain f32 on device; 'refined' adds "
                             "Jacobi scaling + 2 rounds of iterative refinement (LU); "
                             "'chol' is 'refined' with a guarded SPD Cholesky instead of "
                             "LU (avoids the XLA-TPU LU crash at production P, stays on "
                             "device); 'host64' pulls the Fisher matrices to the host "
                             "each apply step and solves in float64 (LAPACK)")
    parser.add_argument("--fisher_refresh", type=int, default=1,
                        help="host64 only: refresh the host-side Fisher blocks every K "
                             "epochs (KFAC-style stale preconditioner) instead of pulling "
                             "the O(P^2) matrices over the device->host link every epoch; "
                             "gradients, mean scores and trust-region logic stay per-epoch "
                             "and all solve math stays f64.  1 = plain host64")
    parser.add_argument("--hang_timeout", type=float, default=0.0,
                        help="hard-exit with code 42 if no epoch completes for this many "
                             "seconds (0 disables) — fail-fast detection for a wedged "
                             "device RPC on the tunneled TPU pool, so a checkpoint-resume "
                             "wrapper can relaunch (utils/watchdog.py; the first interval "
                             "gets a 4x grace for the jit compile chain)")
    parser.add_argument("--tripwire_sigma", type=float, default=15.0,
                        help="revert an update when F jumps upward by more than this many "
                             "combined standard errors in one epoch (0 disables); guards "
                             "against rare catastrophic f32 SR steps")
    parser.add_argument("--timing", action="store_true",
                        help="print a per-phase wall-clock breakdown every 20 epochs "
                             "(sample / accumulate / host pulls / solves / applies); "
                             "inserts block_until_ready fences at phase boundaries, so "
                             "it defeats async dispatch pipelining — diagnosis only")

    # training
    parser.add_argument("--batch", type=int, default=2048,
                        help="batch size per gradient-accumulation step (global)")
    parser.add_argument("--num_devices", type=int, default=0,
                        help="devices in the mesh (0 = all visible)")
    parser.add_argument("--acc_steps", type=int, default=4)
    parser.add_argument("--microbatch", type=int, default=0,
                        help="in-jit gradient-chunk size bounding HBM (0 = whole batch)")
    parser.add_argument("--epoch_finished", type=int, default=0)
    parser.add_argument("--epoch", type=int, default=3000)
    parser.add_argument("--ckpt_every", type=int, default=100)

    # pretraining
    parser.add_argument("--pre_batch", type=int, default=8192)
    parser.add_argument("--pre_epoch", type=int, default=5000)
    parser.add_argument("--cpu", action="store_true", help="force the CPU backend")
    parser.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed (TPU pod slices over DCN)")
    parser.add_argument("--coordinator", default=None,
                        help="multihost coordinator host:port (default: cluster autodetect)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multihost process count (with --coordinator)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this process's rank (with --coordinator)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        # One process per host on a pod slice; device mesh spans all chips.
        # On TPU pods the coordinator is autodetected; explicit flags cover
        # manual launches (and the CPU-backend multi-process test,
        # tests/test_multihost.py).
        if args.coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=args.coordinator,
                num_processes=args.num_processes,
                process_id=args.process_id,
            )
        else:
            jax.distributed.initialize()

    from coulombgas_tpu.config import default_precision

    prec = default_precision()
    import jax.numpy as jnp
    import numpy as np
    from jax.flatten_util import ravel_pytree

    import coulombgas_tpu as cg
    from coulombgas_tpu.io.checkpoint import (
        ckpt_filename, load_data, pretrained_model_filename, save_data, to_host,
    )
    from coulombgas_tpu.io.logging import ObservableLog, stderr_from_moments
    from coulombgas_tpu.parallel.mesh import (
        batch_spec, make_mesh, replicate, replicated_spec, shard_batch,
    )
    from coulombgas_tpu.train.loss import make_loss
    from coulombgas_tpu.train.train import (
        init_accumulators, make_accumulate_and_apply, make_sample_step,
    )

    rdtype = prec.real
    print("jax", jax.__version__, "backend:", jax.default_backend(), "precision:", rdtype)
    key = jax.random.PRNGKey(42)

    n, dim = args.n, args.dim
    if dim == 3:
        L = (4 / 3 * np.pi * n) ** (1 / 3)
        beta = 1 / ((4.5 * np.pi) ** (2 / 3) * args.Theta)
    elif dim == 2:
        L = float(np.sqrt(np.pi * n))
        beta = 1 / (4 * args.Theta)
    else:
        raise ValueError("dim must be 2 or 3")
    print("n = %d, dim = %d, L = %f" % (n, dim, L))
    twist = np.array(args.twist)

    # ---- single-particle orbitals --------------------------------------
    sp_indices, Es = cg.sp_orbitals(dim, args.Emax)
    num_states = Es.size
    print("Number of available single-particle orbitals: %d" % num_states)
    sp_indices_twist, Es_twist = cg.twist_sort(sp_indices, twist)
    # highest-energy states first (empty tail at small indices); kept as a
    # host numpy constant so jit lowering never round-trips the device
    sp_indices_twist = np.asarray(sp_indices_twist[::-1].copy(), rdtype)

    # ---- VAN ------------------------------------------------------------
    van_cfg = cg.TransformerConfig(num_states, args.nlayers, args.modelsize,
                                   args.nheads, args.nhidden)
    params_van = cg.init_transformer_params(key, van_cfg, dim, rdtype)
    print("#parameters in the autoregressive model: %d" % ravel_pytree(params_van)[0].size)

    sampler, log_prob_novmap = cg.make_autoregressive_sampler(
        van_cfg, sp_indices_twist, n, num_states
    )
    log_prob = jax.vmap(log_prob_novmap, (None, 0), 0)

    # ---- pretraining ------------------------------------------------------
    pre_sr, pre_damping, pre_maxnorm, pre_lr = True, 0.001, 0.001, 1e-3
    freefermion_path = os.path.join(
        args.folder,
        "freefermion", "pretraining",
        "n_%d_dim_%d_Theta_%.2f_Emax_%d" % (n, dim, args.Theta, args.Emax)
        + ("_twist" + "_%.3f" * dim) % tuple(twist),
        "nlayers_%d_modelsize_%d_nheads_%d_nhidden_%d" % (
            args.nlayers, args.modelsize, args.nheads, args.nhidden)
        + ("_damping_%.5f_maxnorm_%.5f" % (pre_damping, pre_maxnorm)
           if pre_sr else "_lr_%.3f" % pre_lr)
        + "_batch_%d" % args.pre_batch,
    )
    os.makedirs(freefermion_path, exist_ok=True)
    pre_fname = pretrained_model_filename(freefermion_path)
    if os.path.isfile(pre_fname):
        print("Load pretrained free-fermion model:", pre_fname)
        params_van = jax.tree.map(lambda a: jnp.asarray(a, rdtype), load_data(pre_fname))
    else:
        print("No pretrained model found; running free-fermion pretraining...")
        from coulombgas_tpu.train.pretrain import pretrain

        key, key_pretrain = jax.random.split(key)
        params_van = pretrain(
            van_cfg, params_van, n, dim, args.Theta, args.Emax, twist,
            freefermion_path, key_pretrain,
            pre_lr, pre_sr, pre_damping, pre_maxnorm,
            args.pre_batch, epoch=args.pre_epoch,
        )
        if jax.process_index() == 0:
            save_data(to_host(params_van), pre_fname)
        print("Pretraining done; saved to", pre_fname)

    # ---- flow + logpsi ----------------------------------------------------
    flow_cfg = cg.FermiNetConfig(args.depth, args.spsize, args.tpsize, L)
    params_flow = cg.init_ferminet_params(key, flow_cfg, dim, rdtype)
    print("#parameters in the flow model: %d" % ravel_pytree(params_flow)[0].size)

    flow_apply = lambda p, x: cg.ferminet_apply(p, flow_cfg, x)
    # Jacobian implementation choice is a measured per-config question
    # (PERF.md round-3 A/B: the depth-2 closed form loses end-to-end at the
    # production shapes despite fewer FLOPs); 'auto' takes the faster default.
    from coulombgas_tpu.models.ferminet_jac import select_flow_jac

    impl = args.flow_jac
    if impl == "d2" and args.depth != 2:
        raise ValueError("--flow_jac d2 requires --depth 2")
    flow_jac, flow_jac_lap = select_flow_jac(flow_cfg, impl)
    logphi, logjacdet = cg.make_logphi_logjacdet(flow_apply, sp_indices_twist, L)
    if args.slow_logp:
        # escape hatch: generic-AD Jacobians + LU slogdets everywhere
        logpsi_novmap = cg.make_logpsi(flow_apply, sp_indices_twist, L)
        logp = cg.make_logp(logpsi_novmap)
    else:
        # production: analytic pair-local flow Jacobian + Gram-Cholesky
        # log-dets (Pallas batched kernel in MCMC, differentiable jnp form
        # in the AD paths) — no LU and no jacfwd fan-out anywhere hot;
        # differentially tested in tests/test_fast_logp.py,
        # tests/test_logpsi_fast.py
        from coulombgas_tpu.wavefunction.fast_logp import make_logp_fast

        logpsi_novmap = cg.make_logpsi_fast(flow_jac, sp_indices_twist, L)
        logp = make_logp_fast(
            flow_apply, sp_indices_twist, L,
            chunk=args.mc_microbatch or None,
            jacobian=flow_jac,
            pallas_flow_cfg=flow_cfg,  # batch-in-lanes flow kernel (n <= 32)
            use_d2_flow=args.mc_d2_kernel,
        )

    # ---- Ewald -------------------------------------------------------------
    G = np.asarray(cg.kpoints(dim, args.Gmax), rdtype)
    Vconst = float(n * args.rs / L * cg.madelung(dim, args.kappa, G))  # host scalar
    print("(scaled) Vconst:", float(Vconst) / (n * args.rs / L))

    # ---- optimizer -----------------------------------------------------------
    import optax

    from coulombgas_tpu.optim.sr import hybrid_fisher_sr

    if args.sr:
        classical_score_fn = cg.make_classical_score(log_prob_novmap)
        quantum_score_fn = cg.make_quantum_score(logpsi_novmap)
        refined = args.sr_solver in ("refined", "chol")
        sr_opt = hybrid_fisher_sr(classical_score_fn, quantum_score_fn,
                                  args.damping, args.max_norm,
                                  refine=2 if refined else 0, jacobi=refined,
                                  chol=args.sr_solver == "chol")
        optimizer = None
        opt_state = sr_opt.init((params_van, params_flow))
        print("Optimizer hybrid_fisher_sr: damping = %.5f, max_norm = %.5f, solver = %s"
              % (args.damping, args.max_norm, args.sr_solver))
    else:
        sr_opt = None
        optimizer = optax.adam(args.lr)
        opt_state = optimizer.init((params_van, params_flow))
        print("Optimizer adam: lr = %.3f" % args.lr)

    # ---- mesh ---------------------------------------------------------------
    mesh = make_mesh(num_devices=args.num_devices or None)
    num_devices = mesh.devices.size
    print("Mesh:", mesh)
    if args.batch % num_devices != 0:
        raise ValueError("batch (%d) must be divisible by mesh size (%d)"
                         % (args.batch, num_devices))
    bspec, rspec = batch_spec(mesh), replicated_spec(mesh)

    # ---- run directory / checkpoint ----------------------------------------
    path = os.path.join(
        args.folder,
        # rs uses repr-style float formatting, NOT %.1f: the reference's
        # production run dirs are named rs_0.25 / rs_0.5 / rs_1.0 / rs_10.0
        # (/root/reference/data/), i.e. str(float) — %.1f would mangle
        # rs=0.25 into "0.2" and break byte-compatibility with its analysis
        # tooling.  Identical output for every 1-decimal value.
        "n_%d_dim_%d_rs_%s_Theta_%.2f" % (n, dim, float(args.rs), args.Theta)
        + "_Emax_%d" % args.Emax
        + ("_twist" + "_%.3f" * dim) % tuple(twist)
        + "_nlayers_%d_modelsize_%d_nheads_%d_nhidden_%d" % (
            args.nlayers, args.modelsize, args.nheads, args.nhidden)
        + "_depth_%d_spsize_%d_tpsize_%d" % (args.depth, args.spsize, args.tpsize)
        + "_Gmax_%d_kappa_%d" % (args.Gmax, args.kappa)
        + "_mctherm_%d_mcsteps_%d_mcstddev_%.2f" % (args.mc_therm, args.mc_steps, args.mc_stddev)
        + ("_hutchinson" if args.hutchinson else "")
        + ("_damping_%.5f_maxnorm_%.5f" % (args.damping, args.max_norm)
           if args.sr else "_lr_%.3f" % args.lr)
        + "_batch_%d_ndevices_%d_accsteps_%d" % (args.batch, num_devices, args.acc_steps),
    )
    # The reference's naming scheme tops out at exactly 255 bytes for its 2D
    # production configs; dim=3 (three twist components) exceeds the
    # per-component filesystem limit.  Keep byte-exact names whenever they
    # fit; otherwise truncate + hash, recording the full name inside the run
    # directory so analysis tooling can still recover every hyperparameter.
    run_name = os.path.basename(path)
    if len(run_name.encode()) > 255:
        import hashlib

        digest = hashlib.sha1(run_name.encode()).hexdigest()[:10]
        short = run_name.encode()[: 255 - 11].decode(errors="ignore")
        path = os.path.join(os.path.dirname(path), short + "~" + digest)
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "runname.txt"), "w") as f:
            f.write(run_name + "\n")
    os.makedirs(path, exist_ok=True)
    print("Run directory:", path)

    # ---- training programs --------------------------------------------------
    sample_step = make_sample_step(sampler, logp, args.mc_steps, args.mc_stddev, L, args.batch)
    sample_jit = jax.jit(
        sample_step,
        in_shardings=(rspec, rspec, bspec, None),
        out_shardings=(bspec, bspec, None),
        donate_argnums=(2,),
    )

    if args.laplacian == "analytic":
        from coulombgas_tpu.wavefunction.fast_laplacian import (
            make_logpsi_grad_laplacian_analytic,
        )

        logpsi, _ = cg.make_logpsi_grad_laplacian(logpsi_novmap)
        flow_jac_lap_batched = None
        if args.acc_d2_kernel:
            if args.slow_logp or args.depth != 2:
                raise ValueError("--acc_d2_kernel requires --depth 2 and the "
                                 "fast logp path")
            from coulombgas_tpu.ops.pallas_flow_jac import (
                MAX_FLOW_N_D2, flow_u_jac_lap_pallas_d2,
            )

            if jax.default_backend() == "tpu" and n <= MAX_FLOW_N_D2:
                def flow_jac_lap_batched(p, xb):
                    u, J, lap = flow_u_jac_lap_pallas_d2(p, flow_cfg, xb)
                    return (jnp.moveaxis(u, -1, 0), jnp.moveaxis(J, -1, 0),
                            jnp.moveaxis(lap, -1, 0))
            else:
                # fail loudly rather than silently measuring the XLA
                # fallback (advisor round 3): the flag is an explicit
                # request for the Pallas kernel.
                raise ValueError(
                    "--acc_d2_kernel requested but the d2 Pallas kernel "
                    "cannot engage: backend=%s (needs tpu), n=%d (max %d)"
                    % (jax.default_backend(), n, MAX_FLOW_N_D2))
        logpsi_grad_laplacian = make_logpsi_grad_laplacian_analytic(
            flow_apply, sp_indices_twist, L,
            hutchinson=args.hutchinson, forloop=args.forloop_laplacian,
            flow_jac_lap=None if args.slow_logp else flow_jac_lap,
            flow_jac_lap_batched=flow_jac_lap_batched,
        )
    else:
        logpsi, logpsi_grad_laplacian = cg.make_logpsi_grad_laplacian(
            logpsi_novmap,
            forloop=args.forloop_laplacian,
            hutchinson=args.hutchinson,
            logphi=logphi,
            logjacdet=logjacdet,
        )
    observable_and_lossfn = make_loss(
        log_prob, logpsi, logpsi_grad_laplacian,
        args.kappa, G, L, args.rs, Vconst, beta,
    )
    accumulate, apply_update = make_accumulate_and_apply(
        observable_and_lossfn, optimizer, args.acc_steps, sr_opt,
        microbatch=args.microbatch or None,
    )
    accumulate_jit = jax.jit(
        accumulate,
        in_shardings=(rspec, rspec, bspec, bspec, None, rspec),
        out_shardings=rspec,
        donate_argnums=(5,),
    )
    # NOTE: no donation here — the accumulators have no same-shaped outputs
    # and XLA rejects the param aliases across the optimizer update anyway.
    apply_jit = jax.jit(apply_update)

    # ---- restore or initialize walkers --------------------------------------
    load_ckpt = ckpt_filename(args.epoch_finished, path)
    if os.path.isfile(load_ckpt):
        print("Load checkpoint:", load_ckpt)
        ckpt = load_data(load_ckpt)
        key = jnp.asarray(ckpt["key"])
        if ckpt["x"].shape[0] != args.batch:
            raise ValueError(
                "checkpoint walker batch %d != --batch %d; resume with the "
                "original batch size" % (ckpt["x"].shape[0], args.batch)
            )
        x = shard_batch(jnp.asarray(ckpt["x"], rdtype), mesh)
        params_van = replicate(jax.tree.map(lambda a: jnp.asarray(a, rdtype),
                                            ckpt["params_van"]), mesh)
        params_flow = replicate(jax.tree.map(lambda a: jnp.asarray(a, rdtype),
                                             ckpt["params_flow"]), mesh)
        opt_state = jax.tree.map(jnp.asarray, ckpt["opt_state"])
    else:
        print("No checkpoint found. Starting from scratch; thermalizing...")
        key, subkey = jax.random.split(key)
        x = jax.random.uniform(subkey, (args.batch, n, dim), rdtype, 0.0, L)
        x = shard_batch(x, mesh)
        params_van = replicate(params_van, mesh)
        params_flow = replicate(params_flow, mesh)
        for i in range(args.mc_therm):
            t0 = time.time()
            key, subkey = jax.random.split(key)
            state_indices, x, accept_rate = sample_jit(params_van, params_flow, x, subkey)
            accept_rate.block_until_ready()
            print("---- thermal step %d  accept %.4f  (%.3f s) ----"
                  % (i + 1, float(accept_rate), time.time() - t0))

    # ---- optional phase timing (--timing) -------------------------------------
    timing_acc: dict = {}

    def _tmark(name, t0):
        if args.timing:
            timing_acc[name] = timing_acc.get(name, 0.0) + (time.time() - t0)

    # ---- host64 apply path ---------------------------------------------------
    use_host64 = args.sr and args.sr_solver == "host64"
    if use_host64:
        from coulombgas_tpu.optim.host_sr import (
            HostFisherCache, host_hybrid_apply, sym_pack,
        )

        fisher_cache = (HostFisherCache(args.damping)
                        if args.fisher_refresh > 1 else None)

        _flat_van, unravel_van = ravel_pytree(to_host(params_van))
        _flat_flow, unravel_flow = ravel_pytree(to_host(params_flow))
        p_van, p_flow = _flat_van.size, _flat_flow.size
        data_keys = tuple(sorted(
            init_accumulators(params_van, params_flow, args.sr, rdtype)["data"]
        ))

        @jax.jit
        def apply_host_jit(params_van, params_flow, uv, uf):
            pv = optax.apply_updates(params_van, unravel_van(uv))
            pf = optax.apply_updates(params_flow, unravel_flow(uf))
            return pv, pf

        @jax.jit
        def pack_small_jit(acc):
            # Concatenate every small accumulator leaf (observables, grads,
            # scores, mean quantum score — ~200 pytree leaves) into ONE flat
            # vector on device.  Over the axon tunnel each leaf fetch is a
            # separate host<->device round trip (~10 ms latency each), so
            # per-leaf pulls cost ~2.5 s/epoch at n=29 — the dominant host64
            # overhead after the Fisher cache (round-5 probe; see
            # optim/host_sr.py cost model).  One transfer amortizes it away.
            return jnp.concatenate([
                jnp.stack([acc["data"][k] for k in data_keys]),
                ravel_pytree(acc["grads"][0])[0],
                ravel_pytree(acc["grads"][1])[0],
                ravel_pytree(acc["classical_score"])[0],
                ravel_pytree(acc["quantum_score"])[0],
                jnp.ravel(acc["quantum_score_mean"]),
            ])

        def unpack_small(vec):
            """Host-side inverse of pack_small_jit: rebuild the acc dict shape
            host_hybrid_apply expects (its ravel_host flattens single numpy
            vectors to themselves, so pre-raveled segments drop straight in)."""
            vec = np.asarray(vec, np.float64)
            sizes = [len(data_keys), p_van, p_flow, p_van, p_flow, 2 * p_flow]
            assert vec.size == sum(sizes), (vec.size, sizes)
            dv, gv, gf, sv, sf, qsm = np.split(vec, np.cumsum(sizes)[:-1])
            return {
                "data": dict(zip(data_keys, dv)),
                "grads": (gv, gf),
                "classical_score": sv,
                "quantum_score": sf,
                "quantum_score_mean": qsm.reshape(2, p_flow),
            }

        @jax.jit
        def pack_fishers_jit(acc):
            # Fishers are symmetric: ship only the packed upper triangles —
            # the device->host pull is the host64 step's dominant cost on
            # this link (optim/host_sr.py docstring), and it halves.
            return (sym_pack(acc["classical_fisher"]),
                    sym_pack(acc["quantum_fisher"]))

        @jax.jit
        def pack_qf_jit(acc):
            # quantum Fisher alone: small (P_flow^2/2 ~ 2 MB at n=29), shipped
            # FRESH every epoch so its centering against the current mean
            # score is exact — a frozen quantum block goes indefinite along
            # the moving mean score and forced a full classical refetch nearly
            # every early-training epoch (round-5 timing forensics)
            return sym_pack(acc["quantum_fisher"])

        def host64_apply_step(acc, trust_scale, refresh=True):
            """Host-f64 solve, multi-process safe.

            Every process pulls the (replicated) accumulators and could solve
            locally, but independent LAPACK solves may differ bitwise across
            heterogeneous hosts — so the solve runs everywhere and process 0's
            result is broadcast, keeping the replicated parameters identical
            on all processes.  The update vectors are committed back onto the
            mesh with the replicated sharding (parallel.mesh.replicate handles
            the multi-process make_array_from_callback path).

            With ``--fisher_refresh K`` > 1, only refresh epochs ship the
            O(P^2) Fisher blocks over the link; the others pull just the
            small per-epoch leaves and solve against the cached f64
            factorization (optim/host_sr.HostFisherCache).
            """
            stale = fisher_cache is not None and fisher_cache.ready and not refresh
            t0 = time.time()
            small = pack_small_jit(acc)
            # quantum block: fresh EVERY epoch (small); classical block: only
            # on refresh epochs — it is the one worth amortizing, and its
            # cached factor is SPD by construction so a stale classical solve
            # can never zero-step (optim/host_sr.py)
            qf_packed = pack_qf_jit(acc) if stale else None
            fishers = None if stale else pack_fishers_jit(acc)
            # Start every device->host copy now, classical Fisher first and
            # quantum Fisher last: host_hybrid_apply fetches in that order,
            # so the quantum block streams over the link (DMA) while LAPACK
            # factors the classical block — on this tunnel that overlap hides
            # most of one Fisher transfer per epoch (optim/host_sr.py).
            try:
                if fishers is not None:
                    fishers[0].copy_to_host_async()
                small.copy_to_host_async()
                if qf_packed is not None:
                    qf_packed.copy_to_host_async()
                if fishers is not None:
                    fishers[1].copy_to_host_async()
            except Exception:
                pass  # backends without async D2H: plain blocking fetches
            packed = unpack_small(small)
            _tmark("pull_small", t0)
            if fishers is not None:
                if args.timing:
                    # force the device->host fetch here so the timing report
                    # splits the link transfer from the LAPACK factorization
                    t0 = time.time()
                    fishers = tuple(np.asarray(f) for f in fishers)
                    _tmark("pull_fisher", t0)
                packed["classical_fisher"], packed["quantum_fisher"] = fishers
            else:
                t0 = time.time()
                packed["quantum_fisher"] = np.asarray(qf_packed)
                _tmark("pull_qf", t0)
            t0 = time.time()
            uv, uf, d, diag = host_hybrid_apply(
                packed, args.acc_steps, args.damping,
                args.max_norm * trust_scale, cache=fisher_cache,
            )
            _tmark("host_solve", t0)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                dkeys, dgkeys = sorted(d), sorted(diag)
                payload = np.concatenate([
                    np.asarray(uv, np.float64), np.asarray(uf, np.float64),
                    np.asarray([d[k] for k in dkeys], np.float64),
                    np.asarray([diag[k] for k in dgkeys], np.float64),
                ])
                payload = np.asarray(
                    multihost_utils.broadcast_one_to_all(payload))
                i0, i1 = uv.size, uv.size + uf.size
                uv, uf = payload[:i0], payload[i0:i1]
                d = dict(zip(dkeys, payload[i1:i1 + len(dkeys)].tolist()))
                diag = dict(zip(dgkeys, payload[i1 + len(dkeys):].tolist()))
            t0 = time.time()
            uv_dev = replicate(jnp.asarray(uv, rdtype), mesh)
            uf_dev = replicate(jnp.asarray(uf, rdtype), mesh)
            _tmark("upload_upd", t0)
            return uv_dev, uf_dev, d, diag

    # ---- training loop ---------------------------------------------------------
    is_main = jax.process_index() == 0
    log = ObservableLog(path, resume=args.epoch_finished > 0) if is_main else None
    diag_log = (open(os.path.join(path, "sr_diag.txt"), "a", buffering=1)
                if (is_main and args.sr) else None)
    total_batch = args.batch * args.acc_steps

    # Update tripwire (failure detection/recovery, no reference analogue):
    # rare catastrophic f32 SR steps appear as a discrete upward F jump many
    # standard errors wide in the NEXT epoch's observables (PARITY.md round-2
    # forensics of the n=29 collapse).  On a jump (or non-finite observables)
    # revert to the best healthy parameters and continue; on persistent event
    # bursts the tripwire shrinks trust_scale, applied below to the host64
    # trust radius.  The snapshot includes the WALKERS and RNG key (round-5
    # forensics, data/failed_r5_host64_divergence/): a catastrophic step
    # poisons the Markov chains too, and chains stuck in regions improbable
    # under the restored parameters take hundreds of epochs to recover.  The
    # walker snapshot must be a copy — sample_jit donates x, which would
    # invalidate a held reference one epoch later.
    import math

    from coulombgas_tpu.train.tripwire import UpdateTripwire

    tripwire = UpdateTripwire(sigma=args.tripwire_sigma)
    from coulombgas_tpu.utils.watchdog import StepWatchdog
    watchdog = StepWatchdog(
        args.hang_timeout,
        context="n=%d rs=%g epoch>%d" % (n, args.rs, args.epoch_finished),
    ).start()

    # Zeroing the epoch accumulator is ONE jitted call reusing the previous
    # epoch's donated buffers: eager init_accumulators dispatches ~200 tiny
    # zeros ops (one per leaf), each a separate RPC over the axon tunnel —
    # measured 0.4-0.5 s/epoch of pure dispatch latency (round-5 --timing).
    zero_acc_jit = jax.jit(
        lambda a: jax.tree.map(jnp.zeros_like, a), donate_argnums=0)
    acc = None

    for i in range(args.epoch_finished + 1, args.epoch + 1):
        # the heartbeat is at the TOP of the loop: it certifies the previous
        # epoch's device round-trips (sample/accumulate/apply/pull) resolved
        watchdog.beat()
        t0 = time.time()
        tripwire.snapshot((params_van, params_flow, opt_state,
                           jnp.copy(x), key))
        if acc is None:
            acc = replicate(
                init_accumulators(params_van, params_flow, args.sr, rdtype), mesh)
        else:
            acc = zero_acc_jit(acc)
        if args.timing:
            jax.block_until_ready(acc)
        _tmark("init_acc", t0)
        # accumulated on device: a host float() here would sync and serialize
        # the sample/accumulate dispatch pipeline every acc step
        accept_rate_acc = jnp.zeros((), rdtype)
        for _ in range(args.acc_steps):
            key, k_sample, k_update = jax.random.split(key, 3)
            t0 = time.time()
            state_indices, x, accept_rate = sample_jit(params_van, params_flow, x, k_sample)
            if args.timing:
                jax.block_until_ready(x)
            _tmark("sample", t0)
            accept_rate_acc = accept_rate_acc + accept_rate
            t0 = time.time()
            acc = accumulate_jit(params_van, params_flow, state_indices, x, k_update, acc)
            if args.timing:
                jax.block_until_ready(acc)
            _tmark("accumulate", t0)
        if use_host64:
            uv_dev, uf_dev, d, diag = host64_apply_step(
                acc, tripwire.trust_scale,
                refresh=(i - 1) % args.fisher_refresh == 0,
            )
            t0 = time.time()
            params_van, params_flow = apply_host_jit(
                params_van, params_flow, uv_dev, uf_dev,
            )
            if args.timing:
                jax.block_until_ready(params_van)
            _tmark("device_apply", t0)
        else:
            # trust_scale is a traced scalar: tripwire escalation applies to
            # the on-device SR trust radius too, without recompiling.
            params_van, params_flow, opt_state, data = apply_jit(
                params_van, params_flow, opt_state, acc,
                jnp.asarray(tripwire.trust_scale, rdtype),
            )
            d = {k: float(v) for k, v in data.items()}
            diag = {k[5:]: d.pop(k) for k in [k for k in d if k.startswith("diag_")]}

        accept_rate_acc = float(accept_rate_acc)
        rs2 = args.rs**2

        # ---- tripwire check (observables describe the PRE-apply params) ----
        F_raw = d["F_mean"]
        F_sig = stderr_from_moments(d["F_mean"], d["F2_mean"], total_batch) \
            if math.isfinite(d["F_mean"]) and math.isfinite(d["F2_mean"]) else float("nan")
        finite = all(math.isfinite(v) for v in d.values())
        revert_to = tripwire.check(
            F_raw, F_sig, finite,
            accept=accept_rate_acc / args.acc_steps,
            S=d["S_mean"] if math.isfinite(d["S_mean"]) else None,
        )
        reverted = revert_to is not None
        if reverted:
            params_van, params_flow, opt_state, x_snap, key = revert_to
            # restore a COPY of the snapshot walkers: x is donated into
            # sample_jit next epoch, and the tripwire may hand out the same
            # best-healthy snapshot again on a later event
            x = jnp.copy(x_snap)
            msg = ("TRIPWIRE epoch %d: %s (F %.6f) — reverted parameters and "
                   "walkers to the best healthy state" % (
                       i, tripwire.last_reason, F_raw))
            print(msg)
            if diag_log is not None:
                diag_log.write("# " + msg + "\n")
            if args.sr and tripwire.trust_scale < 1.0:
                # escalation applies to the SR trust radius in every solver
                # path (host64 directly; plain/refined via the traced
                # trust_scale argument of the jitted apply)
                print("TRIPWIRE: trust radius scaled to %g"
                      % (args.max_norm * tripwire.trust_scale))
        elif tripwire.drift_events and tripwire.drift_events[-1] == \
                i - args.epoch_finished:
            # entropy-drift ALARM (no revert target exists along a flat-F
            # leak): loud operator warning + forensic marker in sr_diag.txt
            msg = ("TRIPWIRE epoch %d: entropy-drift ALARM — S %.4f has "
                   "fallen below the established plateau at non-improving F; "
                   "suspect an over-damped/ill-conditioned SR solve "
                   "(see data/failed_r5_chol_extension/README.md)"
                   % (i, d["S_mean"]))
            print(msg)
            if diag_log is not None:
                diag_log.write("# " + msg + "\n")

        if diag_log is not None and diag and not reverted:
            diag_log.write("%6d  %.6e  %.4f  %.6e  %.4f\n" % (
                i, diag.get("gnorm_van", float("nan")), diag.get("scale_van", float("nan")),
                diag.get("gnorm_flow", float("nan")), diag.get("scale_flow", float("nan"))))
        if is_main and not reverted:
            # a reverted epoch's observables describe the corrupted pre-revert
            # parameters (possibly non-finite) — keep them out of data.txt so
            # convergence-tail consumers see only healthy rows (the event
            # itself is recorded in sr_diag.txt); matches pretrain's behavior
            log.write_train(
                i,
                d["F_mean"] / rs2, stderr_from_moments(d["F_mean"], d["F2_mean"], total_batch) / rs2,
                d["E_mean"] / rs2, stderr_from_moments(d["E_mean"], d["E2_mean"], total_batch) / rs2,
                d["K_mean"] / rs2, stderr_from_moments(d["K_mean"], d["K2_mean"], total_batch) / rs2,
                d["V_mean"] / rs2, stderr_from_moments(d["V_mean"], d["V2_mean"], total_batch) / rs2,
                d["S_mean"], stderr_from_moments(d["S_mean"], d["S2_mean"], total_batch),
                accept_rate_acc / args.acc_steps,
            )

        if args.timing and (i - args.epoch_finished) % 20 == 0 and timing_acc:
            acct = sum(timing_acc.values())
            nts = sorted(timing_acc.items(), key=lambda kv: -kv[1])
            print("TIMING .. %d: " % i
                  + "  ".join("%s %.3f" % (k, v / 20.0) for k, v in nts)
                  + "  | accounted %.3f s/epoch" % (acct / 20.0))
            timing_acc.clear()

        if i % args.ckpt_every == 0:
            # to_host is a cross-process collective for non-addressable
            # shards (pod slices), so EVERY process builds the ckpt; only
            # process 0 touches the filesystem.
            ckpt = {
                "key": to_host(key), "x": to_host(x),
                "params_van": to_host(params_van), "params_flow": to_host(params_flow),
                "opt_state": to_host(opt_state),
            }
            if is_main:
                fname = ckpt_filename(i, path)
                save_data(ckpt, fname)
                print("Save checkpoint file:", fname)

    watchdog.stop()
    if log is not None:
        log.close()

    # Replica-consistency diagnostic: every process prints a checksum of its
    # local view of the (replicated) parameters.  On a healthy multi-process
    # run these lines are identical across processes — tests/test_multihost.py
    # asserts this for the host64 solver path, whose host-side LAPACK solves
    # are broadcast from process 0 precisely to keep replicas bitwise in sync.
    pv_host, pf_host = to_host(params_van), to_host(params_flow)
    import hashlib

    h = hashlib.sha256()
    for leaf in jax.tree.leaves((pv_host, pf_host)):
        h.update(np.asarray(leaf).tobytes())
    print("final params checksum:", h.hexdigest())


if __name__ == "__main__":
    main()
