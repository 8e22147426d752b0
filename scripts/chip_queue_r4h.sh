#!/bin/bash
# Round-4h chip schedule (resumed after the API-outage gap, 2026-08-19 09:10).
# State entering this schedule:
#   - rs=1.0 n=29 stage-2: COMPLETE to 2500 epochs, but the CI guard's
#     reference tails are 3000-epoch windows -> resume 2500->3000.
#   - rs=3.0: partial at epoch 1275 (ckpt 1200) -> resume 1200->3000.
#   - rs=5.0: not started -> run with whatever window remains (resumable).
# Deadline-guarded so the driver's end-of-round bench can get the chip.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-19 12:45 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, est_seconds, command...
    local name=$1 est=$2; shift 2
    local left; left=$(remaining)
    if [ "$left" -le 300 ]; then
        echo "[r4h] skip $name: ${left}s left" ; return 1
    fi
    local budget=$left
    echo "[r4h] start $name (timeout ${budget}s, est ${est}s) $(date -u)"
    timeout "$budget" "$@"
    local rc=$?
    echo "[r4h] $name done rc=$rc $(date -u)"
    return $rc
}

# Job 1: rs=1.0 resume to 3000 (closes the staged sweep guard at rs=1)
run_job rs1_finish 2000 env SR_SOLVER=host64 bash scripts/run_sweep.sh 3000 1.0 \
    > /tmp/chip_rs1_finish.log 2>&1

# Job 2: rs=3.0 resume 1200 -> 3000
run_job rs3_finish 6500 env SR_SOLVER=host64 bash scripts/run_sweep.sh 3000 3.0 \
    > /tmp/chip_rs3_finish.log 2>&1

# Job 3: rs=5.0 from scratch; checkpoints every 100 epochs, resumable
run_job rs5_run 11000 env SR_SOLVER=host64 bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_run.log 2>&1

echo "[r4h] all done $(date -u)"
