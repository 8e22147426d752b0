#!/bin/bash
# Round-5 chip schedule, v2 — reordered by value-per-chip-second after the
# packed-D2H host64 fix (main.py pack_small_jit: one transfer per epoch
# instead of ~200 per-leaf pulls at ~10 ms tunnel latency each).
#
#   1. rs=3.0 extension 3600 -> 4500: the final-20% guard window of the
#      3600-epoch log straddles the epoch-3008 resume transient (F spiked to
#      +18, tripwire reverted, rough until ~3100), dragging the window mean
#      to -11.157 vs the converged tail's -11.217; pushing the log to 4500
#      moves the window to ~3584-4480, past the transient.  Flips the one
#      red artifact guard (test_stage2_n29_sweep_tail_vs_reference[rs3.0]).
#   2. rs=0.25 resume (ckpt ~epoch 300) to the full 3000-epoch protocol.
#   3. rs=0.5 from scratch to 2950 (guard activates at 2900 rows).
#   4. rs=5.0 finish 600 -> 2950.
#   5. rs=10.0 f64-tail extension + n=57 flagship extension only if time
#      remains (they validate already-green rows; the above create/repair
#      guard coverage).
#
# Every job runs under the remaining-window timeout so the chip is free
# before the driver's end-of-round bench.  All SR solves on the f64 host
# path with the Fisher pull amortized 16x (run_sweep.sh defaults).
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-20 01:10 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, command...
    local name=$1; shift
    local left; left=$(remaining)
    if [ "$left" -le 300 ]; then
        echo "[r5b] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r5b] start $name (timeout ${left}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r5b] $name done rc=$rc $(date -u)"
    return $rc
}

run_job rs3_extend2 bash scripts/run_sweep.sh 4500 3.0 \
    > /tmp/chip_rs3_extend2.log 2>&1

run_job rs025_run bash scripts/run_sweep.sh 3000 0.25 \
    > /tmp/chip_rs025_run2.log 2>&1

run_job rs05_run bash scripts/run_sweep.sh 2950 0.5 \
    > /tmp/chip_rs05_run.log 2>&1

run_job rs5_finish bash scripts/run_sweep.sh 2950 5.0 \
    > /tmp/chip_rs5_finish.log 2>&1

run_job rs10_extend python -u main.py --n 29 --rs 10.0 --Theta 0.15 \
    --Emax 25 --batch 2048 --acc_steps 4 --epoch 3600 --epoch_finished 3000 \
    --sr --hutchinson --sr_solver host64 --fisher_refresh 16 \
    --tripwire_sigma 6 --folder data/interacting/ \
    > /tmp/chip_rs10_extend.log 2>&1

# n=57 flagship extension: budget epochs from the remaining window (~11 s/ep)
LEFT=$(remaining)
N57_EPOCHS=$(( 600 + (LEFT - 600) / 11 ))
N57_EPOCHS=$(( N57_EPOCHS / 100 * 100 ))
if [ "$N57_EPOCHS" -ge 800 ]; then
    run_job n57_extend python -u main.py --n 57 --rs 1.0 --Theta 0.15 \
        --Emax 49 --batch 512 --acc_steps 16 \
        --epoch "$N57_EPOCHS" --epoch_finished 600 \
        --sr --hutchinson --sr_solver host64 --fisher_refresh 16 \
        --tripwire_sigma 6 --folder data/interacting/ \
        > /tmp/chip_n57_extend.log 2>&1
else
    echo "[r5b] skip n57_extend: only ${LEFT}s left"
fi

echo "[r5b] all done $(date -u)"
