#!/bin/bash
# Round-4 chip schedule: sequential TPU jobs in judged priority order
# (VERDICT round 3, "Next round: do this"), with a chip-grant gate BEFORE
# EVERY JOB so a job's timeout never burns while the pool is dry.
#
# Job 0 is bench.py (now watchdog-hardened): the driver runs its own bench at
# round end, but running it first, as soon as a grant appears, guarantees a
# builder-side number (saved to BENCH_r04_builder.json and /tmp/chip_bench.log).
#
# Every training job is resume-friendly; a timeout mid-job loses nothing.
#
# Usage: nohup bash scripts/chip_queue_r4.sh >> /tmp/chip_queue.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[queue-r4] start $(date)"

wait_for_chip() {
    local i
    for i in $(seq 1 720); do   # up to ~60h of probing — the round ends first
        if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
            echo "[queue-r4] chip granted (probe $i) $(date)"
            return 0
        fi
        echo "[queue-r4] probe $i: no chip yet $(date)"
        sleep 30
    done
    return 1
}

run_job() {
    local name=$1 tmo=$2
    shift 2
    wait_for_chip || { echo "[queue-r4] gate expired before $name"; return 1; }
    echo "[queue-r4] start $name (timeout ${tmo}s) $(date)"
    timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
    echo "[queue-r4] $name done rc=$? $(date)"
}

# 0. Measured round-4 bench on the real chip (insurance for BENCH_r04).
run_job bench 2700 python -u bench.py
grep -h '^{' /tmp/chip_bench.log | tail -1 > BENCH_r04_builder.json || true

# 1. Flow-Jacobian A/B on the real chip (VERDICT #5): opt-in d2 kernels vs
#    the carried default at the bench configs; records the measurement that
#    gates making either kernel a default (or culling them).
run_job ab 3600 python -u scripts/bench_flow_jac_ab.py --iters 3

# 2. Resume the n=49 stage-1 pretraining to a 1e-4 tail (VERDICT #3).
#    Resumes from data/parity_r2/n_49_Emax_36_batch_8192_clip_5_host64/
#    ckpt_van.pkl (epoch 200); target tail-mean F within 0.0049 of 91.9022.
run_job n49_stage1 10800 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 800 \
    --folder data/parity_r2 --clip 5 --solver host64 --resume

# 3. n=57 rs=1.0 flagship stage-2 with the stabilized optimizer (VERDICT #2).
#    Seeded from the staged f64-converged VAN (--pre_batch 2048 matches the
#    staged directory).  Bar: S holds ~25 through the early epochs (the old
#    optimizer collapsed to 11.7 by epoch 17).
run_job n57_flagship 14400 python -u main.py \
    --n 57 --dim 2 --rs 1.0 --Theta 0.15 --Emax 49 \
    --batch 512 --acc_steps 16 --epoch 600 \
    --sr --hutchinson --sr_solver host64 --tripwire_sigma 6 \
    --pre_batch 2048 --folder data/interacting/

# 4. rs sweep at n=29 (VERDICT #4), resume-friendly; as many epochs as fit.
run_job sweep 21600 bash scripts/run_sweep.sh 3000 1.0 3.0 5.0

# 5. n=57 stage-1 on TPU with the proven n=49 recipe (VERDICT #6):
#    host64 + clip + tripwire.  Bar: descending through the 107.5 plateau
#    toward the exact 106.763.
run_job n57_stage1 10800 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 2048 --epoch 800 \
    --folder data/parity_r4 --clip 5 --solver host64 --resume

echo "[queue-r4] all done $(date)"
