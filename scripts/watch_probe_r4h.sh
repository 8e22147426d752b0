#!/bin/bash
# Fire the grid-d2 hardware probe at the rs1->rs3 chip boundary (r4h queue).
# The probe races the queue's next job for the device grant; if it loses it
# blocks, so it is bounded at 900 s and we retry at a later boundary.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_rs1_finish.log
for i in $(seq 1 720); do
    if grep -q "final params checksum" "$LOG" 2>/dev/null; then
        echo "[watch] boundary detected $(date -u)" >> /tmp/probe_grid_r4h.log
        timeout 900 python -u scripts/probe_d2_grid.py \
            >> /tmp/probe_grid_r4h.log 2>&1
        echo "[watch] probe rc=$? $(date -u)" >> /tmp/probe_grid_r4h.log
        exit 0
    fi
    sleep 5
done
echo "[watch] gave up waiting $(date -u)" >> /tmp/probe_grid_r4h.log
