#!/bin/bash
# Round-5 chip schedule, v4 — the post-VM-restart continuation queue.
# The restart killed the r5c queue mid-rs=0.25; this session restarted that
# row immediately (pid in /tmp/r5_py.pid) and re-planned the remaining
# window around what can actually COMPLETE in it:
#   1. Wait for the running rs=0.25 resume (800 -> 3000) to exit: closes
#      the 4th n=29 sweep row (guard activates at >= 2900 rows).
#   2. n=49 stage-1 re-attempt at the <= 1e-4/particle target (VERDICT r4
#      #6) with the exact recipe that landed n=57 at 8.3e-5/particle
#      (PARITY.md round 5): guarded-chol f64-accurate solves + clip 5,
#      seeded from the committed f64-CPU escape.  ~500 epochs, bounded by
#      the deadline; this CAN complete in the window.
#   3. rs=5.0 resume (668 -> elastic): cannot reach its 2900-row guard in
#      any remaining window (needs ~7000 s), so it takes whatever is left
#      and its guard activates in a future run of the sweep script.
# Rationale for dropping r5c's rs=0.5-from-scratch and n=49-interacting
# slots: neither can complete OR move a named VERDICT gap further than the
# two slots above within the ~3 h session window on one chip.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-20 07:02 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, command...
    local name=$1; shift
    local left; left=$(remaining)
    if [ "$left" -le 240 ]; then
        echo "[r5d] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r5d] start $name (timeout ${left}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r5d] $name done rc=$rc $(date -u)"
    return $rc
}

# -- 1: wait for the live rs=0.25 resume --------------------------------
PID=$(cat /tmp/r5_py.pid 2>/dev/null || true)
if [ -n "${PID:-}" ] && ps -p "$PID" -o cmd= 2>/dev/null | grep -q "rs 0.25"; then
    echo "[r5d] waiting for rs=0.25 (pid $PID) $(date -u)"
    while ps -p "$PID" >/dev/null 2>&1; do
        if [ "$(remaining)" -le 0 ]; then
            echo "[r5d] deadline while waiting; killing $PID"; kill "$PID"; break
        fi
        sleep 20
    done
    echo "[r5d] rs=0.25 finished $(date -u)"
fi

# -- 2: n=49 stage-1 at the 1e-4 target (the n=57-proven recipe) ---------
run_job n49_stage1 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 500 \
    --folder data/parity_r5 --clip 5 --solver chol \
    --init_from data/parity_f64/n_49_Emax_36_batch_2048/params_van.pkl \
    --resume > /tmp/chip_n49_stage1.log 2>&1

# -- 3: rs=5.0 resume, elastic to the deadline ---------------------------
run_job rs5_resume bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_resume.log 2>&1

echo "[r5d] all done $(date -u)"
