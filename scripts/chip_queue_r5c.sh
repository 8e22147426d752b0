#!/bin/bash
# Round-5 chip schedule, v3 — the continuation session's queue after the
# rs=0.25 row (already live when this session started) completes:
#   1. Wait for the running rs=0.25 job (pidfile /tmp/r5_run.pid) to exit.
#   2. rs=5.0 finish 600 -> 3000 (run_sweep.sh resume path): with rs=0.25
#      this closes the n=29 sweep's last in-progress row.
#   3. rs=0.5 from scratch to 3000: the final missing sweep row — the n=29
#      result matrix (VERDICT r4 missing #1) is then 6/6.
#   4. n=49 stage-1 re-attempt at the <=1e-4/particle target (VERDICT r4
#      #6) with the EXACT recipe that landed n=57 at 8.3e-5 (PARITY.md
#      round 5): guarded-chol f64-accurate solves + clip 5, seeded from the
#      committed f64-CPU escape — the one seed the round-4 floor
#      experiments never tried (they resumed f32-trained checkpoints; the
#      1.76e-4 fixed point may be basin-, not precision-, limited).
#   5. Stage the best n=49 VAN into the interacting pretraining path, then
#      start the FIRST n=49 interacting row (VERDICT r4 missing #2 /
#      next #8): rs=1.0, Emax=36, batch 512 x acc 16 (the reference's
#      per-device production shape, same as the n=57 flagship), with ALL
#      remaining window — elastic job, killed by the deadline timeout; its
#      guard activates later like every sweep row.
# All SR solves on the f64 host path with the classical Fisher factor
# amortized (run_sweep.sh defaults: host64 + --fisher_refresh 32).
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d "2026-08-20 11:45 UTC" +%s)}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

run_job() {  # name, command...
    local name=$1; shift
    local left; left=$(remaining)
    if [ "$left" -le 300 ]; then
        echo "[r5c] skip $name: ${left}s left $(date -u)"; return 1
    fi
    echo "[r5c] start $name (timeout ${left}s) $(date -u)"
    timeout "$left" "$@"
    local rc=$?
    echo "[r5c] $name done rc=$rc $(date -u)"
    return $rc
}

# -- 1: wait for the live rs=0.25 run (started by the previous session) ----
PID=$(cat /tmp/r5_run.pid 2>/dev/null || true)
if [ -n "${PID:-}" ] && ps -p "$PID" -o cmd= 2>/dev/null | grep -q "rs 0.25"; then
    echo "[r5c] waiting for rs=0.25 (pid $PID) $(date -u)"
    while ps -p "$PID" >/dev/null 2>&1; do
        if [ "$(remaining)" -le 0 ]; then
            echo "[r5c] deadline while waiting; killing $PID"; kill "$PID"; break
        fi
        sleep 20
    done
    echo "[r5c] rs=0.25 finished $(date -u)"
fi

run_job rs5_finish bash scripts/run_sweep.sh 3000 5.0 \
    > /tmp/chip_rs5_finish.log 2>&1

run_job rs05_run bash scripts/run_sweep.sh 3000 0.5 \
    > /tmp/chip_rs05_run.log 2>&1

run_job n49_stage1 python -u scripts/pretrain_parity.py \
    --n 49 --Emax 36 --batch 8192 --epoch 500 \
    --folder data/parity_r5 --clip 5 --solver chol \
    --init_from data/parity_f64/n_49_Emax_36_batch_2048/params_van.pkl \
    --resume > /tmp/chip_n49_stage1.log 2>&1

# -- 5: stage the n=49 VAN for the interacting run --------------------------
PRE_DIR="data/interacting/freefermion/pretraining/n_49_dim_2_Theta_0.15_Emax_36_twist_0.250_0.250/nlayers_2_modelsize_16_nheads_4_nhidden_32_damping_0.00100_maxnorm_0.00100_batch_8192"
mkdir -p "$PRE_DIR"
if [ ! -f "$PRE_DIR/params_van.pkl" ]; then
    for cand in data/parity_r5/n_49_Emax_36_batch_8192_clip_5_chol/params_van.pkl \
                data/parity_r5/n_49_Emax_36_batch_8192_clip_5_chol/ckpt_van.pkl \
                data/parity_r2/n_49_Emax_36_batch_8192_clip_5_maxnorm_0.0001_chol/ckpt_van.pkl; do
        if [ -f "$cand" ]; then
            echo "[r5c] staging n=49 VAN from $cand"
            # ckpt_van.pkl wraps {params_van, epoch}; main.py wants the raw
            # params pytree — normalize either form
            python3 - "$cand" "$PRE_DIR/params_van.pkl" <<'EOF'
import pickle, sys
with open(sys.argv[1], "rb") as f:
    obj = pickle.load(f)
if isinstance(obj, dict) and "params_van" in obj:
    obj = obj["params_van"]
with open(sys.argv[2], "wb") as f:
    pickle.dump(obj, f)
EOF
            break
        fi
    done
fi

# -- 6: first n=49 interacting row, elastic to the deadline -----------------
run_job n49_rs1 python -u main.py --n 49 --rs 1.0 --Theta 0.15 \
    --Emax 36 --batch 512 --acc_steps 16 --epoch 3000 \
    --sr --hutchinson --sr_solver host64 --fisher_refresh 32 \
    --tripwire_sigma 6 --folder data/interacting/ \
    > /tmp/chip_n49_rs1.log 2>&1

echo "[r5c] all done $(date -u)"
