#!/bin/bash
# Round-5 end-of-window reaper: at DEADLINE, terminate the live sweep run so
# the single-grant TPU pool is free before the driver's end-of-round bench.
# Kills by walking the recorded process tree (run_sweep bash -> python),
# NEVER by command-line pattern.
set -u
DEADLINE=${DEADLINE:?set DEADLINE epoch seconds}
ROOT_PID=${ROOT_PID:?set ROOT_PID of the run_sweep bash}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    ps -p "$ROOT_PID" >/dev/null 2>&1 || { echo "[reaper] tree $ROOT_PID already gone $(date -u)"; exit 0; }
    sleep 15
done

echo "[reaper] deadline $(date -u) — terminating tree under $ROOT_PID"
kids=$(ps -o pid= --ppid "$ROOT_PID" 2>/dev/null)
kill "$ROOT_PID" $kids 2>/dev/null
sleep 10
kill -9 "$ROOT_PID" $kids 2>/dev/null
echo "[reaper] done $(date -u)"
