"""Physics-parity run: free-fermion VAN pretraining vs the exact oracle.

Reproduces the reference's stage-1 baseline (BASELINE.md: n=13, Emax=25,
batch 8192, SR damping/maxnorm 1e-3, twist (1/4,1/4); converged
F = 24.811018 +- 4e-5, S = 4.504) on the local accelerator, and reports the
final EWM-averaged F/E/S against the mpmath oracle.

Run:  python scripts/pretrain_parity.py --n 13 --epoch 2000 --folder /tmp/parity
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=13)
    parser.add_argument("--dim", type=int, default=2)
    parser.add_argument("--Theta", type=float, default=0.15)
    parser.add_argument("--Emax", type=int, default=25)
    parser.add_argument("--batch", type=int, default=8192)
    parser.add_argument("--epoch", type=int, default=2000)
    parser.add_argument("--folder", default="/tmp/parity")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--log_every", type=int, default=10)
    parser.add_argument("--dps", type=int, default=400)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--clip", type=float, default=None,
                        help="TV clip factor for the REINFORCE weights "
                        "(off by default = reference semantics)")
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--damping", type=float, default=1e-3)
    parser.add_argument("--max_norm", type=float, default=1e-3,
                        help="SR trust-region radius; the convergence floor "
                        "of the f32 stochastic geometry scales with it, so "
                        "shrinking it near convergence is the standard way "
                        "to trade pace for a lower tail bias")
    parser.add_argument("--solver", choices=["plain", "refined", "chol", "host64"], default="plain",
                        help="SR dense-solve numerics (host64 = f64 LAPACK on host)")
    parser.add_argument("--tripwire", type=float, default=15.0,
                        help="update-tripwire threshold in combined stderrs "
                        "(train/tripwire.py); 0 disables")
    parser.add_argument("--ckpt_every", type=int, default=50,
                        help="save params_van to ckpt_van.pkl every this many "
                        "epochs (0 disables)")
    parser.add_argument("--init_from", type=str, default=None,
                        help="seed the VAN parameters from an existing "
                        "ckpt_van.pkl while logging into this config's own "
                        "(fresh) folder — for controlled optimizer-tail "
                        "experiments resumed from a converged run")
    parser.add_argument("--resume", action="store_true",
                        help="continue from the run directory's ckpt_van.pkl")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from coulombgas_tpu.config import default_precision

    prec = default_precision()

    import numpy as np
    from mpmath import mpf

    from coulombgas_tpu.analytic.canonical import Z_E
    from coulombgas_tpu.analysis.ewm import running_average
    from coulombgas_tpu.models.transformer import TransformerConfig, init_transformer_params
    from coulombgas_tpu.physics.orbitals import sp_orbitals
    from coulombgas_tpu.train.pretrain import pretrain

    twist = [0.25, 0.25] if args.dim == 2 else [0.25, 0.25, 0.25]
    _, Es = sp_orbitals(args.dim, args.Emax)
    cfg = TransformerConfig(Es.size, 2, 16, 4, 32)
    key = jax.random.PRNGKey(args.seed)
    params = init_transformer_params(key, cfg, args.dim, prec.real)

    path = os.path.join(args.folder, f"n_{args.n}_Emax_{args.Emax}_batch_{args.batch}"
                        + (f"_seed_{args.seed}" if args.seed != 42 else "")
                        + (f"_clip_{args.clip:g}" if args.clip is not None else "")
                        + (f"_lr_{args.lr:g}" if args.lr != 1e-3 else "")
                        + (f"_damping_{args.damping:g}" if args.damping != 1e-3 else "")
                        + (f"_maxnorm_{args.max_norm:g}" if args.max_norm != 1e-3 else "")
                        + (f"_{args.solver}" if args.solver != "plain" else ""))
    os.makedirs(path, exist_ok=True)

    F_x, E_x, S_x = (
        float(v)
        for v in Z_E(args.n, args.dim, mpf(str(args.Theta)),
                     [mpf(str(t)) for t in twist], args.Emax, dps=args.dps)
    )

    epoch_finished = 0
    ckpt_file = os.path.join(path, "ckpt_van.pkl")
    if args.init_from and not (args.resume and os.path.exists(ckpt_file)):
        # controlled-experiment seed: params only; the epoch counter starts
        # at 0 in the fresh folder (a later --resume of THIS folder wins)
        import pickle

        with open(args.init_from, "rb") as f:
            ckpt = pickle.load(f)
        # either a full checkpoint dict or a raw params pytree (which is
        # itself a dict: embed/layers/out/x1hat) — key on the wrapper field
        wrapped = isinstance(ckpt, dict) and "params_van" in ckpt
        params = ckpt["params_van"] if wrapped else ckpt
        key = jax.random.fold_in(key, hash(args.init_from) % (1 << 30))
        print("seeded params from %s (epoch %s)"
              % (args.init_from, ckpt.get("epoch", "?") if wrapped else "?"))
    if args.resume:
        if os.path.exists(ckpt_file):
            import pickle

            with open(ckpt_file, "rb") as f:
                ckpt = pickle.load(f)
            params, epoch_finished = ckpt["params_van"], ckpt["epoch"]
            key = jax.random.fold_in(key, epoch_finished)
            print("resuming from epoch %d" % epoch_finished)
        else:
            # queue-friendly: the first run of a gated, re-entrant chip job
            # passes --resume unconditionally; start fresh instead of dying
            print("no checkpoint at %s; starting fresh" % ckpt_file)

    params = pretrain(
        cfg, params, args.n, args.dim, args.Theta, args.Emax, twist,
        path, key, lr=args.lr, sr=True, damping=args.damping,
        max_norm=args.max_norm,
        batch=args.batch, epoch=args.epoch, dps=args.dps,
        log_every=args.log_every, clip_factor=args.clip,
        solver=args.solver, tripwire_sigma=args.tripwire,
        ckpt_every=args.ckpt_every, epoch_finished=epoch_finished,
    )
    from coulombgas_tpu.io.checkpoint import pretrained_model_filename, save_data

    save_data(params, pretrained_model_filename(path))

    data = np.loadtxt(os.path.join(path, "data.txt"), ndmin=2)
    # converged estimate: plain mean over the final 20% of logged epochs
    # (an EWM from epoch 1 would still carry the early transient), with the
    # standard error of that mean from the per-epoch scatter
    tail = data[-max(1, len(data) // 5):]
    for j, (name, exact) in enumerate([("F", F_x), ("E", E_x), ("S", S_x)]):
        col = tail[:, 1 + 2 * j]
        mean, err = col.mean(), col.std() / np.sqrt(len(col))
        print(
            "%s: tail-mean %.6f +- %.6f | exact %.6f | diff %.2e (per particle %.2e)"
            % (name, mean, err, exact, mean - exact, (mean - exact) / args.n)
        )


if __name__ == "__main__":
    main()
