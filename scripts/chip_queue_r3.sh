#!/bin/bash
# Round-3 chip schedule: sequential TPU jobs in judged priority order
# (VERDICT round 2, "Next round: do this").  Each job logs to its own file;
# every run is resume-friendly, so a timeout mid-job loses nothing.
#
# Usage: scripts/chip_queue_r3.sh   (run via nohup; writes /tmp/chip_*.log)
set -u
cd "$(dirname "$0")/.."

echo "[queue] start $(date)"

# Gate: wait for a chip grant from the pool before starting the clock on the
# per-job timeouts (jax.devices() blocks until the relay grants the device).
for i in $(seq 1 100); do
    if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
        echo "[queue] chip granted after probe $i $(date)"
        break
    fi
    echo "[queue] probe $i: no chip yet $(date)"
    sleep 30
done

# 1. Flow-Jacobian A/B on the real chip (VERDICT #1): carried vs d2 at all
#    three bench configs; the default was already reverted to carried,
#    this records the measurement.
timeout 3600 python -u scripts/bench_flow_jac_ab.py --iters 3 \
    > /tmp/chip_ab.log 2>&1
echo "[queue] A/B done rc=$? $(date)"

# 2. Resume the n=49 stage-1 pretraining to a 1e-4 tail (VERDICT #2).
#    Resumes from data/parity_r2/n_49_Emax_36_batch_8192_clip_5_host64/
#    ckpt_van.pkl (epoch 200); target tail-mean F within 0.0049 of 91.9022.
timeout 10800 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 800 \
    --folder data/parity_r2 --clip 5 --solver host64 --resume \
    > /tmp/chip_n49_stage1.log 2>&1
echo "[queue] n49 stage-1 done rc=$? $(date)"

# 3. n=57 rs=1.0 flagship stage-2 with the stabilized optimizer (VERDICT #3).
#    Seeded from the staged f64-converged VAN (--pre_batch 2048 matches the
#    staged directory).  Bar: S holds ~25 through the early epochs (the old
#    optimizer collapsed to 11.7 by epoch 17).
timeout 14400 python -u main.py \
    --n 57 --dim 2 --rs 1.0 --Theta 0.15 --Emax 49 \
    --batch 512 --acc_steps 16 --epoch 600 \
    --sr --hutchinson --sr_solver host64 --tripwire_sigma 6 \
    --pre_batch 2048 --folder data/interacting/ \
    > /tmp/chip_n57_flagship.log 2>&1
echo "[queue] n57 flagship done rc=$? $(date)"

# 4. rs sweep at n=29 (VERDICT #4), resume-friendly; as many epochs as fit.
timeout 14400 bash scripts/run_sweep.sh 3000 1.0 3.0 5.0 \
    > /tmp/chip_sweep.log 2>&1
echo "[queue] sweep done rc=$? $(date)"

echo "[queue] all done $(date)"
