#!/bin/bash
# Round-4 boundary watcher: when the sweep finishes its rs=1.0 row (the
# run_sweep.sh driver prints "==== rs = 3.0 ====" and starts compiling the
# next row), stop the r4f queue tree and spend the remaining window in
# judged order:
#   1. probe the grid-accumulation d2 rewrite on the real chip (cheap,
#      promote-or-park gate — scripts/probe_d2_grid.py)
#   2. n=57 stage-1 on TPU seeded from the f64-converged VAN (VERDICT #6:
#      the remaining stage-1 claim whose only evidence is CPU f64)
#   3. resume the rs=3.0 sweep row until the deadline (resume-friendly)
# Survives builder-session restarts (this round has had two).
#
# Usage: QUEUE_PID=$(cat /tmp/queue_r4f.pid) nohup bash scripts/chip_boundary_r4g.sh >> /tmp/chip_boundary_r4g.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

DEADLINE=${DEADLINE:-$(date -u -d '2026-08-19 07:00' +%s)}
QUEUE_PID=${QUEUE_PID:-}
echo "[r4g] start $(date) (deadline $(date -u -d @$DEADLINE))"

remaining() { echo $(( DEADLINE - $(date +%s) )); }

kill_tree() {
    local pid=$1 child
    for child in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
        kill_tree "$child"
    done
    kill "$pid" 2>/dev/null
}

# 1. Wait for the rs=1.0 boundary (or the queue dying on its own).
while :; do
    if grep -q "==== rs = 3.0" /tmp/chip_sweep.log 2>/dev/null; then
        echo "[r4g] rs=1.0 boundary reached $(date)"
        [ -n "$QUEUE_PID" ] && kill_tree "$QUEUE_PID"
        sleep 10
        break
    fi
    if [ -n "$QUEUE_PID" ] && ! kill -0 "$QUEUE_PID" 2>/dev/null; then
        echo "[r4g] queue exited on its own $(date)"
        break
    fi
    if [ "$(remaining)" -lt 600 ]; then
        echo "[r4g] deadline approaching with rs=1.0 still running — leaving it"
        exit 0
    fi
    sleep 20
done

run_job() {
    local name=$1 tmo=$2 rem
    shift 2
    rem=$(remaining)
    if [ "$rem" -lt 240 ]; then
        echo "[r4g] deadline reached before $name"
        return 1
    fi
    [ "$tmo" -gt "$rem" ] && tmo=$rem
    echo "[r4g] start $name (timeout ${tmo}s) $(date)"
    timeout "$tmo" "$@" > "/tmp/chip_${name}.log" 2>&1
    echo "$?" > "/tmp/chip_${name}.rc"
    echo "[r4g] $name done rc=$(cat /tmp/chip_${name}.rc) $(date)"
}

# 2. Grid-d2 probe (also times kernel vs carried at the MCMC shapes).
run_job probe_grid 1500 python -u scripts/probe_d2_grid.py

# 3. n=57 stage-1 on TPU, seeded from the f64-converged VAN.
run_job n57_stage1 2100 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 8192 --epoch 500 \
    --folder data/parity_r4 --clip 5 --solver chol \
    --init_from data/parity_n57_f64/n_57_Emax_49_batch_2048/params_van.pkl \
    --resume

# 4. rs=3.0 sweep row until the deadline (resumable next round).
run_job sweep3 12600 env SR_SOLVER=chol bash scripts/run_sweep.sh 2500 3.0

echo "[r4g] all done $(date)"
