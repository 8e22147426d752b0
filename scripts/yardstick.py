"""External performance yardstick: reference vs this framework, same host.

The reference publishes no wall-clock numbers (BASELINE.md), and bench.py's
``vs_baseline`` compares against this framework's own round-1 pin — a
self-referential yardstick (VERDICT round 1, weak #4).  This script produces
a real cross-implementation ratio: it runs the REFERENCE ``main.py``
(haiku/pmap, via scripts/_ref_shim.py) and THIS framework's ``main.py`` on
the SAME config, both CPU float64 with 8 virtual XLA host devices, and times
epochs by timestamping each child's per-epoch stdout line — so compile time
(first epochs) is excluded and no second calibration run is needed.

Both runs are seeded with their own pretrained n=13 VAN so the measured loop
is the production interacting step (sample + update).  Usage:

    python scripts/yardstick.py --epochs 8 --batch 1024 --out PERF_yardstick.json
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
REFERENCE = "/root/reference"


def timed_epochs(cmd, env, cwd, marker="iter:", log_path=None):
    """Run cmd, timestamp each stdout line starting with ``marker``."""
    t_lines = []
    proc = subprocess.Popen(cmd, env=env, cwd=cwd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, bufsize=1)
    log = open(log_path, "w", buffering=1) if log_path else None
    for line in proc.stdout:
        if log:
            log.write(line)
        if line.lstrip().startswith(marker):
            t_lines.append(time.time())
    proc.wait()
    if log:
        log.close()
    if proc.returncode != 0:
        raise RuntimeError("%r failed rc=%d (see %s)" % (cmd, proc.returncode, log_path))
    return t_lines


def epoch_seconds(stamps, skip=2):
    """Mean gap between consecutive epoch lines, skipping the first ``skip``
    gaps (compile + cache warmup)."""
    gaps = [b - a for a, b in zip(stamps, stamps[1:])][skip:]
    if not gaps:
        raise RuntimeError("not enough epochs to time (got %d lines)" % len(stamps))
    return sum(gaps) / len(gaps), len(gaps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--acc_steps", type=int, default=1)
    ap.add_argument("--n", type=int, default=13)
    ap.add_argument("--skip", type=int, default=2, help="warmup epoch gaps to drop")
    ap.add_argument("--hutchinson", action="store_true",
                    help="production Laplacian estimator (reference "
                    "run/submit.py:36); use for the n=29 production config")
    ap.add_argument("--out", default=os.path.join(REPO, "PERF_yardstick.json"))
    ap.add_argument("--workdir", default="/tmp/yardstick")
    args = ap.parse_args()

    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    # line-accurate child stdout: the epoch timestamps ARE the measurement
    env["PYTHONUNBUFFERED"] = "1"
    common = ["--n", str(args.n), "--dim", "2", "--rs", "10.0", "--Theta", "0.15",
              "--Emax", "25", "--sr", "--batch", str(args.batch),
              "--acc_steps", str(args.acc_steps), "--epoch", str(args.epochs)]
    if args.hutchinson:
        common.append("--hutchinson")

    results = {"config": {"n": args.n, "batch": args.batch,
                          "acc_steps": args.acc_steps, "epochs": args.epochs,
                          "hutchinson": args.hutchinson,
                          "backend": "cpu f64, 8 virtual devices, single host core"}}

    # ---- reference ------------------------------------------------------
    ref_dir = os.path.join(args.workdir, "ref")
    shutil.rmtree(ref_dir, ignore_errors=True)
    os.makedirs(ref_dir)
    # seed with the reference's own pretrained n=13 VAN so no pretraining runs
    shutil.copytree(os.path.join(REFERENCE, "data", "freefermion"),
                    os.path.join(ref_dir, "freefermion"))
    # the reference's pickles were written by an old JAX whose array avals
    # (named_shape) no longer deserialize; round-trip them through the compat
    # unpickler to plain numpy leaves (haiku consumes those fine)
    import pickle

    sys.path.insert(0, REPO)
    from coulombgas_tpu.io.import_reference import load_data as compat_load

    for root, _, files in os.walk(ref_dir):
        for fn in files:
            if fn.endswith(".pkl"):
                p = os.path.join(root, fn)
                data = compat_load(p)
                with open(p, "wb") as f:
                    pickle.dump(data, f)
    stamps = timed_epochs(
        [sys.executable, os.path.join(REPO, "scripts", "_ref_shim.py")]
        + common + ["--folder", ref_dir + "/", "--num_devices", "8"],
        env, REPO, log_path=os.path.join(args.workdir, "ref.log"))
    s, k = epoch_seconds(stamps, args.skip)
    results["reference_s_per_epoch"] = round(s, 3)
    results["reference_epochs_timed"] = k
    print("reference: %.3f s/epoch (%d epochs timed)" % (s, k))

    # ---- this framework -------------------------------------------------
    our_dir = os.path.join(args.workdir, "ours")
    shutil.rmtree(our_dir, ignore_errors=True)
    os.makedirs(our_dir)
    src_van = os.path.join(REPO, "data", "interacting", "freefermion")
    shutil.copytree(src_van, os.path.join(our_dir, "freefermion"))
    stamps = timed_epochs(
        [sys.executable, os.path.join(REPO, "main.py")]
        + common + ["--folder", our_dir + "/", "--cpu", "--num_devices", "8"],
        env, REPO, log_path=os.path.join(args.workdir, "ours.log"))
    s, k = epoch_seconds(stamps, args.skip)
    results["ours_s_per_epoch"] = round(s, 3)
    results["ours_epochs_timed"] = k
    print("this framework: %.3f s/epoch (%d epochs timed)" % (s, k))

    results["speedup"] = round(results["reference_s_per_epoch"]
                               / results["ours_s_per_epoch"], 3)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
