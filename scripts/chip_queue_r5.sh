#!/bin/bash
# Round-5 chip schedule — closes the n=29 result matrix (VERDICT r4 #3) and
# validates the host64+fisher_refresh solver policy on the rows that exposed
# the chol entropy leak:
#   1. rs=3.0 extension 3000 -> 3600: the committed row's tail ran on the
#      demoted chol solver and misses its 2e-4/pp F guard at 2.8e-4
#      (VERDICT weak #2); a 600-epoch f64 tail replaces the final-20% window.
#   2. rs=0.25 from scratch (3000 epochs, reference protocol)
#   3. rs=0.5 from scratch
#   4. rs=5.0 finish (668 -> 3000, resumes from epoch_000600.pkl)
#   5. rs=10.0 extension 3000 -> 3600 under the f64 path: re-runs the exact
#      segment where the chol extension leaked entropy (S 4.49 -> 3.87,
#      data/failed_r5_chol_extension/) and where the first host64 re-attempt
#      cascaded on poisoned walkers (data/failed_r5_host64_divergence/) —
#      now with tripwire v2 (walker revert + stderr/accept guards).
#   6. n=57 rs=1.0 flagship extension with whatever window remains
#      (VERDICT r4 #5), epochs budgeted from the clock at ~11 s/epoch.
# All SR solves on the f64 host path, Fisher pull amortized 16x
# (--fisher_refresh 16, optim/host_sr.HostFisherCache).
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-20 01:15 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, est_seconds, command...
    local name=$1 est=$2; shift 2
    local left; left=$(remaining)
    if [ "$left" -le 300 ]; then
        echo "[r5] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r5] start $name (timeout ${left}s, est ${est}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r5] $name done rc=$rc $(date -u)"
    return $rc
}

run_job rs3_extend 2000 python -u main.py --n 29 --rs 3.0 --Theta 0.15 \
    --Emax 25 --batch 2048 --acc_steps 4 --epoch 3600 --epoch_finished 3000 \
    --sr --hutchinson --sr_solver host64 --fisher_refresh 16 \
    --tripwire_sigma 6 --folder data/interacting/ \
    > /tmp/chip_rs3_extend.log 2>&1

run_job rs025_run 10000 bash scripts/run_sweep.sh 3000 0.25 \
    > /tmp/chip_rs025_run.log 2>&1

run_job rs05_run 10000 bash scripts/run_sweep.sh 3000 0.5 \
    > /tmp/chip_rs05_run.log 2>&1

run_job rs5_finish 8000 bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_finish.log 2>&1

run_job rs10_extend 2000 python -u main.py --n 29 --rs 10.0 --Theta 0.15 \
    --Emax 25 --batch 2048 --acc_steps 4 --epoch 3600 --epoch_finished 3000 \
    --sr --hutchinson --sr_solver host64 --fisher_refresh 16 \
    --tripwire_sigma 6 --folder data/interacting/ \
    > /tmp/chip_rs10_extend.log 2>&1

# n=57 flagship extension: budget epochs from the remaining window
LEFT=$(remaining)
N57_EPOCHS=$(( 600 + (LEFT - 600) / 11 ))
N57_EPOCHS=$(( N57_EPOCHS / 100 * 100 ))
if [ "$N57_EPOCHS" -ge 800 ]; then
    run_job n57_extend $LEFT python -u main.py --n 57 --rs 1.0 --Theta 0.15 \
        --Emax 49 --batch 512 --acc_steps 16 \
        --epoch "$N57_EPOCHS" --epoch_finished 600 \
        --sr --hutchinson --sr_solver host64 --fisher_refresh 16 \
        --tripwire_sigma 6 --folder data/interacting/ \
        > /tmp/chip_n57_extend.log 2>&1
else
    echo "[r5] skip n57_extend: only ${LEFT}s left"
fi

echo "[r5] all done $(date -u)"
