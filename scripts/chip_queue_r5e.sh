#!/bin/bash
# Round-5 chip schedule, v5 — the final-round closeout queue.
# Supersedes r5d, whose DEADLINE (07:02 UTC) was baked from the previous
# session window; this window runs to ~08:38 UTC, which changes what can
# COMPLETE — and in the last round, "complete" is the only state that
# activates a CI guard (there is no next session to resume into).
#
#   1. Wait for the live rs=0.25 resume (800 -> 3000, pid in
#      /tmp/r5_py.pid): closes the 4th n=29 sweep row.
#   2. rs=5.0 resume (668 -> 3000) FIRST: ~2330 epochs at the measured
#      3.1 s/epoch amortized host64 rate ≈ 120 min — fits the window
#      start-to-finish, and its SWEEP_MANIFEST guard activates at
#      >= 2900 rows.  r5d's ordering (n=49 first) would have cut this
#      row at the deadline and left the guard skipped forever.
#   3. n=49 stage-1 at the <= 1e-4/particle target (VERDICT r4 #6) with
#      the n=57-proven recipe, elastic in whatever window remains.  The
#      n>=49 stage-1 story is already CI-pinned at n=57 (8.3e-5/particle,
#      PARITY.md round 5), so this slot is a refinement, not a gap-closer
#      — it correctly gets the scraps.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-20 08:25 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, command...
    local name=$1; shift
    local left; left=$(remaining)
    if [ "$left" -le 240 ]; then
        echo "[r5e] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r5e] start $name (timeout ${left}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r5e] $name done rc=$rc $(date -u)"
    return $rc
}

# -- 1: wait for the live rs=0.25 resume --------------------------------
PID=$(cat /tmp/r5_py.pid 2>/dev/null || true)
if [ -n "${PID:-}" ] && ps -p "$PID" -o cmd= 2>/dev/null | grep -q "rs 0.25"; then
    echo "[r5e] waiting for rs=0.25 (pid $PID) $(date -u)"
    while ps -p "$PID" >/dev/null 2>&1; do
        if [ "$(remaining)" -le 0 ]; then
            echo "[r5e] deadline while waiting; killing $PID"; kill "$PID"; break
        fi
        sleep 20
    done
    echo "[r5e] rs=0.25 finished $(date -u)"
fi

# -- 2: rs=5.0 resume to 3000 (guard activates at >= 2900 rows) ----------
run_job rs5_resume bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_resume.log 2>&1

# -- 3: n=49 stage-1 at the 1e-4 target (the n=57-proven recipe) ---------
run_job n49_stage1 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 500 \
    --folder data/parity_r5 --clip 5 --solver chol \
    --init_from data/parity_f64/n_49_Emax_36_batch_2048/params_van.pkl \
    --resume > /tmp/chip_n49_stage1.log 2>&1

echo "[r5e] all done $(date -u)"
