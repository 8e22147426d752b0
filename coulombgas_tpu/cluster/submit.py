"""Cluster job generation: Slurm (GPU clusters) and TPU pod (GKE/xpk-style).

Capability parity with reference run/submit.py + run/config/*.py (hostname-
dispatched Slurm jobfile generation with the canonical production arg set),
extended with a TPU-pod launcher since this framework targets TPU slices.

Usage:
    python -m coulombgas_tpu.cluster.submit --backend slurm --partition a100 \
        --ngpus 8 --jobname n57
    python -m coulombgas_tpu.cluster.submit --backend tpu --tpu-type v5p-8
"""

from __future__ import annotations

import os
import socket
import subprocess
import textwrap

__all__ = ["production_args", "slurm_script", "tpu_pod_script", "submitjob"]


def production_args(n=57, Emax=49, batch=512, acc_steps=16, epoch=5000, folder="./data/"):
    """The canonical production argument set (reference run/submit.py:29-41)."""
    return (
        f"--folder {folder} "
        f"--n {n} --dim 2 --rs 1.0 --Theta 0.15 --Emax {Emax} "
        "--nlayers 2 --modelsize 16 --nheads 4 --nhidden 32 "
        "--depth 2 --spsize 16 --tpsize 16 "
        "--Gmax 15 --kappa 10 "
        "--mc_therm 10 --mc_steps 50 --mc_stddev 0.1 "
        "--hutchinson --sr --damping 0.001 --max_norm 0.001 "
        f"--batch {batch} --acc_steps {acc_steps} --epoch {epoch}"
    )


def slurm_script(program: str, partition: str, ngpus: int, jobname: str,
                 time_limit: str = "96:00:00") -> str:
    """Single-node Slurm jobfile (the reference's cluster layout)."""
    return textwrap.dedent(
        f"""\
        #!/bin/bash
        #SBATCH --partition={partition}
        #SBATCH --nodes=1
        #SBATCH --gres=gpu:{ngpus}
        #SBATCH --cpus-per-task=8
        #SBATCH --time={time_limit}
        #SBATCH --job-name={jobname}
        #SBATCH --output=%x-%j.out

        echo "The current job ID is $SLURM_JOB_ID"
        echo "Running on $SLURM_JOB_NUM_NODES nodes: $SLURM_JOB_NODELIST"
        echo "Using $SLURM_NTASKS_PER_NODE tasks per node"

        python {program}
        """
    )


def tpu_pod_script(program: str, tpu_type: str, jobname: str,
                   zone: str = "us-central2-b") -> str:
    """gcloud TPU-VM launcher: one process per host, JAX picks up the slice."""
    return textwrap.dedent(
        f"""\
        #!/bin/bash
        # Launch on every host of the TPU slice; jax.distributed initializes
        # from the TPU environment automatically.
        gcloud compute tpus tpu-vm ssh {jobname} \\
          --zone={zone} --worker=all \\
          --command="cd $(pwd) && python {program}"
        """
    )


def submitjob(jobfile: str, dry_run: bool = False):
    """sbatch the jobfile (or just print it with dry_run)."""
    if dry_run:
        print(open(jobfile).read())
        return None
    return subprocess.run(["sbatch", jobfile], check=True)


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Generate and submit cluster jobs")
    parser.add_argument("--backend", choices=["slurm", "tpu"], default=None,
                        help="default: slurm on known Slurm hosts, else tpu")
    parser.add_argument("--partition", default="a100")
    parser.add_argument("--ngpus", type=int, default=8)
    parser.add_argument("--tpu-type", default="v5p-8")
    parser.add_argument("--zone", default="us-central2-b")
    parser.add_argument("--jobname", default="coulombgas")
    parser.add_argument("--n", type=int, default=57)
    parser.add_argument("--Emax", type=int, default=49)
    parser.add_argument("--batch", type=int, default=512)
    parser.add_argument("--acc_steps", type=int, default=16)
    parser.add_argument("--epoch", type=int, default=5000)
    parser.add_argument("--folder", default="./data/")
    parser.add_argument("--submit", action="store_true", help="actually sbatch")
    args = parser.parse_args()

    backend = args.backend or ("slurm" if os.environ.get("SLURM_CONF") else "tpu")
    program = "main.py " + production_args(
        args.n, args.Emax, args.batch, args.acc_steps, args.epoch, args.folder
    )
    if backend == "slurm":
        script = slurm_script(program, args.partition, args.ngpus, args.jobname)
    else:
        script = tpu_pod_script(program, args.tpu_type, args.jobname, args.zone)

    jobfile = f"jobfile_{args.jobname}.sh"
    with open(jobfile, "w") as f:
        f.write(script)
    print("Wrote", jobfile, "for host", socket.gethostname())
    if args.submit:
        submitjob(jobfile)
    else:
        print(script)
