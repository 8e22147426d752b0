#!/bin/bash
# Round-4 chip schedule, revision b: adapts to the two findings of the first
# chip window (2026-08-18 morning):
#   1. the tunnel's device<->host link is ~25-100x slower than round 1-2
#      (host64's Fisher pull measured 54-205 s per apply), so every queued
#      host64 production job would be transfer-bound — jobs below run the new
#      ON-DEVICE guarded-Cholesky solver (--sr_solver chol) instead, probed
#      first (job 0) and physics-validated live by the n=49 resume (job 1,
#      oracle 91.9022 known);
#   2. the d2 Pallas kernels fail Mosaic lowering ("Only 2D gather is
#      supported") — job 0 also captures the full traceback so the kernels
#      can be fixed or culled (VERDICT r3 #5).
#
# Usage: nohup bash scripts/chip_queue_r4b.sh >> /tmp/chip_queue_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[queue-r4b] start $(date)"

wait_for_chip() {
    local i
    for i in $(seq 1 720); do
        if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
            echo "[queue-r4b] chip granted (probe $i) $(date)"
            return 0
        fi
        echo "[queue-r4b] probe $i: no chip yet $(date)"
        sleep 30
    done
    return 1
}

run_job() {
    local name=$1 tmo=$2
    shift 2
    wait_for_chip || { echo "[queue-r4b] gate expired before $name"; return 1; }
    echo "[queue-r4b] start $name (timeout ${tmo}s) $(date)"
    timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
    echo "[queue-r4b] $name done rc=$? $(date)"
}

# 0. Probes: (a) chol solver compile/accuracy/time at production P + raw D2H
#    bandwidth; (b) d2 kernel gather traceback.
run_job probe_chol 1800 python -u scripts/probe_device_solver.py
run_job probe_d2 1800 env JAX_TRACEBACK_FILTERING=off python -u scripts/repro_d2_gather.py

# 1. Resume the n=49 stage-1 pretraining to a 1e-4 tail (VERDICT #3) on the
#    on-device chol solver.  Oracle F = 91.9022: the first ~100 epochs of
#    data.txt directly validate chol-vs-host64 physics.
run_job n49_stage1 10800 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 800 \
    --folder data/parity_r2 --clip 5 --solver chol --resume

# 2. n=57 rs=1.0 flagship stage-2 with the stabilized optimizer (VERDICT #2).
run_job n57_flagship 14400 python -u main.py \
    --n 57 --dim 2 --rs 1.0 --Theta 0.15 --Emax 49 \
    --batch 512 --acc_steps 16 --epoch 600 \
    --sr --hutchinson --sr_solver chol --tripwire_sigma 6 \
    --pre_batch 2048 --folder data/interacting/

# 3. rs sweep at n=29 (VERDICT #4), resume-friendly.
run_job sweep 21600 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 1.0 3.0 5.0

# 4. n=57 stage-1 on TPU with the proven n=49 recipe (VERDICT #6).
run_job n57_stage1 10800 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 2048 --epoch 800 \
    --folder data/parity_r4 --clip 5 --solver chol --resume

echo "[queue-r4b] all done $(date)"
