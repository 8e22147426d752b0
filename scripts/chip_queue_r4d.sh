#!/bin/bash
# Round-4 chip schedule, revision d: the machine restarted mid-round (the
# /tmp state and the .jax_cache compile cache were wiped), so this queue
# re-runs the remaining judged-priority jobs with a fresh deadline:
#   1. BENCH_r04 (VERDICT #1) — full three-config bench with the chol
#      production solver; also re-warms the on-disk compile cache so the
#      driver's own end-of-round bench hits warm executables.
#   2. d2 Mosaic re-probe (VERDICT #5) — commit ba0e555 split the
#      slice-then-newaxis gather sites after the first on-chip probe failed
#      lowering; this decides promote-or-cull for the d2 kernel surface.
#   3. n=49 stage-1 floor experiment (VERDICT #3) — resume the epoch-800
#      chol checkpoint (F 2.3e-4/particle above the oracle) with
#      max_norm 1e-4: the SR noise floor scales with the trust radius.
#   4. Flow-kernel A/B on real hardware (VERDICT #5) — only if the
#      re-probe lowers; promote or cull per the measurement.
#   5. rs sweep at n=29 (VERDICT #4) — rs 1.0, 3.0, 5.0 sequential and
#      resume-friendly; runs until the deadline cap, resumes next window.
#
# HARD DEADLINE: no job may hold the chip when the driver's end-of-round
# bench runs (round restarted 01:57 UTC Aug 19; ~5 h -> ends ~06:57).
# Every job's timeout is capped to the time remaining before DEADLINE and
# nothing launches in the final 5 minutes.
#
# Usage: nohup bash scripts/chip_queue_r4d.sh >> /tmp/chip_queue_r4d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DEADLINE=${DEADLINE:-$(date -u -d '2026-08-19 06:30' +%s)}
echo "[queue-r4d] start $(date) (deadline $(date -u -d @$DEADLINE))"

remaining() { echo $(( DEADLINE - $(date +%s) )); }

wait_for_chip() {
    local i
    for i in $(seq 1 720); do
        [ "$(remaining)" -lt 300 ] && return 1
        if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
            echo "[queue-r4d] chip granted (probe $i) $(date)"
            return 0
        fi
        echo "[queue-r4d] probe $i: no chip yet $(date)"
        sleep 30
    done
    return 1
}

run_job() {
    local name=$1 tmo=$2 rem
    shift 2
    rem=$(remaining)
    if [ "$rem" -lt 300 ]; then
        echo "[queue-r4d] deadline reached before $name — stopping queue"
        return 1
    fi
    [ "$tmo" -gt "$rem" ] && tmo=$rem
    wait_for_chip || { echo "[queue-r4d] no chip for $name"; return 1; }
    echo "[queue-r4d] start $name (timeout ${tmo}s) $(date)"
    timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
    local rc=$?
    echo "$rc" > "/tmp/chip_${name}.rc"
    echo "[queue-r4d] $name done rc=$rc $(date)"
    return 0
}

# 1. BENCH_r04 builder measurement (VERDICT #1) + compile-cache warm-up.
run_job bench_r04 4200 bash -c \
    'python -u bench.py | tee /tmp/bench_r04.out && grep "^{" /tmp/bench_r04.out | tail -1 > BENCH_r04_builder.json'

# 2. d2 Mosaic lowering re-probe after the ba0e555 gather fix (VERDICT #5).
run_job probe_d2b 900 env JAX_TRACEBACK_FILTERING=off python -u scripts/repro_d2_gather.py

# 3. n=49 stage-1 floor experiment: max_norm 1e-4 from the epoch-800
#    chol checkpoint (VERDICT #3; oracle F = 91.902174).
run_job n49_floor 3000 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 600 \
    --folder data/parity_r2 --clip 5 --solver chol --max_norm 1e-4 \
    --init_from data/parity_r2/n_49_Emax_36_batch_8192_clip_5_chol/ckpt_van.pkl \
    --resume

# 4. Flow-kernel A/B on the real chip, gated on the re-probe (VERDICT #5).
if [ "$(cat /tmp/chip_probe_d2b.rc 2>/dev/null)" = "0" ]; then
    run_job flow_ab 2400 python -u scripts/bench_flow_jac_ab.py
else
    echo "[queue-r4d] skipping flow_ab: d2 re-probe rc=$(cat /tmp/chip_probe_d2b.rc 2>/dev/null)"
fi

# 5. rs sweep at n=29 (VERDICT #4) — sequential, resume-friendly; runs until
#    the deadline cap kills it, then resumes next window.
run_job sweep 21600 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 1.0 3.0 5.0

echo "[queue-r4d] all done $(date)"
