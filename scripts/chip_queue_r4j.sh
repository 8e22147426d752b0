#!/bin/bash
# Round-4j chip schedule — takes over from r4i after its rs=3.0 job (which
# keeps running; this script waits for it), so the remaining window fits:
#   1. n=57 stage-1 on TPU (VERDICT #6) — ~35 min
#   2. rs=10 flagship extension 3000 -> 3600 (VERDICT weak #4: convert the
#      4% entropy band into evidence with a longer tail) — ~33 min
#   3. rs=5.0 from scratch with any scraps (resumable next round)
# Deadline 13:15 UTC leaves a ~45 min buffer before the earliest plausible
# round end (~14:00) so the driver's bench gets a quiet chip.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-19 13:15 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, est_seconds, command...
    local name=$1 est=$2; shift 2
    local left; left=$(remaining)
    if [ "$left" -le 300 ]; then
        echo "[r4j] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r4j] start $name (timeout ${left}s, est ${est}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r4j] $name done rc=$rc $(date -u)"
    return $rc
}

# Wait for the r4i rs=3.0 wrapper (pid captured at launch) to exit.
RS3_PID=${RS3_PID:-14724}
echo "[r4j] waiting for rs3 wrapper pid $RS3_PID $(date -u)"
while kill -0 "$RS3_PID" 2>/dev/null; do
    if [ "$(remaining)" -le 0 ]; then
        echo "[r4j] deadline passed while waiting; exiting $(date -u)"; exit 1
    fi
    sleep 10
done
echo "[r4j] rs3 wrapper exited $(date -u)"

run_job n57_stage1 2100 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 8192 --epoch 500 \
    --folder data/parity_r4 --clip 5 --solver chol \
    --init_from data/parity_n57_f64/n_57_Emax_49_batch_2048/params_van.pkl \
    --resume > /tmp/chip_n57_stage1b.log 2>&1

run_job rs10_extend 2000 python main.py --n 29 --rs 10.0 --Theta 0.15 \
    --Emax 25 --batch 2048 --acc_steps 4 --epoch 3600 --epoch_finished 3000 \
    --sr --hutchinson --sr_solver chol --tripwire_sigma 6 \
    --folder data/interacting/ > /tmp/chip_rs10_extend.log 2>&1

run_job rs5_run 11000 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_run.log 2>&1

echo "[r4j] all done $(date -u)"
