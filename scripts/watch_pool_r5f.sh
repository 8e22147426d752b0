#!/bin/bash
# Round-5f: the axon pool stopped granting mid-epoch (rs=5.0 resume wedged
# at epoch 967, killed 06:51 UTC; fresh probes hang in jax.devices()).
# Probe for a device grant every 2 minutes; the moment one succeeds,
# relaunch the rs=5.0 sweep resume (auto-resumes from the newest epoch
# checkpoint) with a hard deadline so nothing outlives the round window.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-20 09:10 UTC" +%s)}

probe() {
    timeout 90 python -c "
import jax
import jax.numpy as jnp
jax.devices()
x = jnp.ones((128, 128))
assert float((x @ x)[0, 0]) == 128.0
" >/dev/null 2>&1
}

while :; do
    left=$(( DEADLINE - $(date +%s) ))
    if [ "$left" -le 300 ]; then
        echo "[r5f] deadline reached while pool dry $(date -u)"; exit 1
    fi
    if probe; then
        echo "[r5f] pool grants again $(date -u) — relaunching rs=5.0"
        break
    fi
    echo "[r5f] pool still dry $(date -u)"
    sleep 60
done

left=$(( DEADLINE - $(date +%s) ))
timeout "$left" bash scripts/run_sweep.sh 3000 5.0 > /tmp/chip_rs5_resume2.log 2>&1
echo "[r5f] rs5 rc=$? $(date -u)"
