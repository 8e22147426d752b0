#!/bin/bash
# Round-4 chip schedule, revision f: supersedes r4e after its first two jobs.
# r4e's bench re-run completed (BENCH_r04_builder.json: n13 0.6497 / n49
# 6.879 / n57 0.779 s/step) and its n49_floor job was started; this revision
# takes over from the n49_floor boundary because the remaining window
# (~2.5 h) fits roughly ONE full 3000-epoch sweep row, so the sweep runs at
# 2500 epochs instead — still above the artifact guards' 2400-row floor
# (tests/test_artifacts.py::test_stage2_n29_sweep_tail_vs_reference) — and
# the saved ~25 min gives rs=3.0 a resumable head start.  The flow A/B stays
# dropped: the d2 re-probe measured a register-spill VMEM OOM at n=57
# (PERF.md round-4; kernels parked).
#
# Usage: WAIT_PID=<n49_floor pid> nohup bash scripts/chip_queue_r4f.sh >> /tmp/chip_queue_r4f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DEADLINE=${DEADLINE:-$(date -u -d '2026-08-19 07:00' +%s)}
WAIT_PID=${WAIT_PID:-}
echo "[queue-r4f] start $(date) (deadline $(date -u -d @$DEADLINE))"

remaining() { echo $(( DEADLINE - $(date +%s) )); }

wait_for_chip() {
    local i
    for i in $(seq 1 720); do
        [ "$(remaining)" -lt 300 ] && return 1
        if timeout 300 python -c "import jax; jax.devices()" > /dev/null 2>&1; then
            echo "[queue-r4f] chip granted (probe $i) $(date)"
            return 0
        fi
        echo "[queue-r4f] probe $i: no chip yet $(date)"
        sleep 30
    done
    return 1
}

run_job() {
    local name=$1 tmo=$2 rem
    shift 2
    rem=$(remaining)
    if [ "$rem" -lt 300 ]; then
        echo "[queue-r4f] deadline reached before $name — stopping queue"
        return 1
    fi
    [ "$tmo" -gt "$rem" ] && tmo=$rem
    wait_for_chip || { echo "[queue-r4f] no chip for $name"; return 1; }
    echo "[queue-r4f] start $name (timeout ${tmo}s) $(date)"
    timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
    local rc=$?
    echo "$rc" > "/tmp/chip_${name}.rc"
    echo "[queue-r4f] $name done rc=$rc $(date)"
    return 0
}

# 0. Let the orphaned n49_floor job (inherited from r4e) finish and release
#    the chip; its own `timeout 3000` bounds it.
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do
        echo "[queue-r4f] waiting for n49_floor (pid $WAIT_PID) $(date)"
        sleep 30
    done
    echo "[queue-r4f] n49_floor exited $(date)"
fi

# 1. rs sweep at n=29: 2500 epochs per rs value, sequential, resume-friendly;
#    the deadline cap kills it cleanly and a future window resumes it.
run_job sweep 12600 env SR_SOLVER=chol bash scripts/run_sweep.sh 2500 1.0 3.0 5.0

echo "[queue-r4f] all done $(date)"
