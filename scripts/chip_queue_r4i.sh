#!/bin/bash
# Round-4i chip schedule — replaces r4h, whose SR_SOLVER=host64 paid the
# slow-tunnel Fisher pull every epoch (~37 s/epoch vs chol's ~3.3: the
# overnight r4f/r4g runs used the on-device guarded-Cholesky solver, and
# run_sweep.sh's own header documents the tunnel-D2H caveat).
#   1. rs=1.0 resume 2600 -> 3000 (closes the staged sweep guard at rs=1)
#   2. rs=3.0 resume 1200 -> 3000
#   3. n=57 stage-1 on TPU with the proven n=49 recipe (VERDICT #6),
#      unblocked by the pretrain_parity --init_from raw-pytree fix
#   4. rs=5.0 with whatever window remains (resumable next round)
# Deadline-guarded so the driver's end-of-round bench can get the chip.
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-19 12:45 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, est_seconds, command...
    local name=$1 est=$2; shift 2
    local left; left=$(remaining)
    if [ "$left" -le 300 ]; then
        echo "[r4i] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r4i] start $name (timeout ${left}s, est ${est}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r4i] $name done rc=$rc $(date -u)"
    return $rc
}

run_job rs1_finish 1500 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 1.0 \
    >> /tmp/chip_rs1_finish.log 2>&1

run_job rs3_finish 6200 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 3.0 \
    > /tmp/chip_rs3_finish.log 2>&1

run_job n57_stage1 2100 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 8192 --epoch 500 \
    --folder data/parity_r4 --clip 5 --solver chol \
    --init_from data/parity_n57_f64/n_57_Emax_49_batch_2048/params_van.pkl \
    --resume > /tmp/chip_n57_stage1b.log 2>&1

run_job rs5_run 11000 env SR_SOLVER=chol bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_run.log 2>&1

echo "[r4i] all done $(date -u)"
