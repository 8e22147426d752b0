#!/bin/bash
# Round-4 chip schedule, revision c: runs after the n=57 flagship stage-2
# (queue r4b job 2) releases the chip.  Ordered by VERDICT r3 priority:
#   1. BENCH_r04 measurement (VERDICT #1) — bench.py with the chol production
#      solver; the builder's own record in BENCH_r04_builder.json.
#   2. d2 Mosaic re-probe (VERDICT #5) — commit ba0e555 fixed the
#      slice-then-newaxis gather sites AFTER the 12:31 probe failed; this
#      decides promote-or-cull for the ~900 LoC d2 kernel surface.
#   3. n=49 stage-1 floor experiment (VERDICT #3) — the chol resume hit a
#      flat 2.39e-4/particle floor (epochs 500-800); resume from that
#      checkpoint with max_norm 1e-4 (SR noise-floor scales with the trust
#      radius) to push toward the 1e-4 bar.
#   4. Flow-kernel A/B on real hardware (VERDICT #5) — only if the re-probe
#      lowers; promote or cull per the measurement.
#   5. rs sweep at n=29 (VERDICT #4) — rs in priority order 1.0, 3.0, 5.0,
#      resume-friendly; each completed row un-skips its artifact guard.
#   6. n=57 stage-1 with the proven n=49 recipe (VERDICT #6) — if time.
#
# HARD DEADLINE: no job may hold the chip when the driver's end-of-round
# bench runs (round started ~10:08 UTC; ~12 h -> ends ~22:08).  Every job's
# timeout is capped to the time remaining before DEADLINE, and nothing
# launches in the final 5 minutes, so the chip is free for BENCH_r04 proper.
#
# Usage: nohup bash scripts/chip_queue_r4c.sh >> /tmp/chip_queue_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DEADLINE=${DEADLINE:-$(date -u -d '2026-08-18 21:20' +%s)}
echo "[queue-r4c] start $(date) (deadline $(date -u -d @$DEADLINE))"

remaining() { echo $(( DEADLINE - $(date +%s) )); }

wait_for_chip() {
    local i
    for i in $(seq 1 720); do
        [ "$(remaining)" -lt 300 ] && return 1
        if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
            echo "[queue-r4c] chip granted (probe $i) $(date)"
            return 0
        fi
        echo "[queue-r4c] probe $i: no chip yet $(date)"
        sleep 30
    done
    return 1
}

run_job() {
    local name=$1 tmo=$2 rem
    shift 2
    rem=$(remaining)
    if [ "$rem" -lt 300 ]; then
        echo "[queue-r4c] deadline reached before $name — stopping queue"
        return 1
    fi
    [ "$tmo" -gt "$rem" ] && tmo=$rem
    wait_for_chip || { echo "[queue-r4c] no chip for $name"; return 1; }
    echo "[queue-r4c] start $name (timeout ${tmo}s) $(date)"
    timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
    local rc=$?
    echo "$rc" > "/tmp/chip_${name}.rc"
    echo "[queue-r4c] $name done rc=$rc $(date)"
    return 0
}

# 1. BENCH_r04 builder measurement (VERDICT #1).  bench.py prints the
#    canonical JSON line on stdout; keep the builder's own copy.
run_job bench_r04 2700 bash -c \
    'python -u bench.py | tee /tmp/bench_r04.out && grep "^{" /tmp/bench_r04.out | tail -1 > BENCH_r04_builder.json'

# 2. d2 Mosaic lowering re-probe after the ba0e555 gather fix (VERDICT #5).
run_job probe_d2b 900 env JAX_TRACEBACK_FILTERING=off python -u scripts/repro_d2_gather.py

# 3. n=49 stage-1 floor experiment: max_norm 1e-4 from the epoch-800
#    checkpoint (VERDICT #3; oracle F = 91.902174).
run_job n49_floor 3000 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 600 \
    --folder data/parity_r2 --clip 5 --solver chol --max_norm 1e-4 \
    --init_from data/parity_r2/n_49_Emax_36_batch_8192_clip_5_chol/ckpt_van.pkl \
    --resume

# 4. Flow-kernel A/B on the real chip, gated on the re-probe (VERDICT #5).
if [ "$(cat /tmp/chip_probe_d2b.rc 2>/dev/null)" = "0" ]; then
    run_job flow_ab 2700 python -u scripts/bench_flow_jac_ab.py
else
    echo "[queue-r4c] skipping flow_ab: d2 re-probe rc=$(cat /tmp/chip_probe_d2b.rc 2>/dev/null)"
fi

# 5. rs sweep at n=29 (VERDICT #4) — sequential, resume-friendly; runs until
#    the deadline cap kills it, then resumes next window.
run_job sweep 21600 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 1.0 3.0 5.0

# 6. n=57 stage-1 (VERDICT #6) — only reached if the sweep finished early.
run_job n57_stage1 7200 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 2048 --epoch 800 \
    --folder data/parity_r4 --clip 5 --solver chol --resume

echo "[queue-r4c] all done $(date)"
