#!/bin/bash
# rs-sweep driver: n=29 interacting runs across the coupling sweep, run
# sequentially on the local chip with the stabilized optimizer (host-f64 SR
# solves + update tripwire, the combination that converged n=29 rs=10 to
# reference parity — PARITY.md), then the analysis pipeline
# (python -m coulombgas_tpu.analysis.plot) over the results.
# Reference comparison logs: /root/reference/data/n_29_dim_2_rs_*.
#
# Resume-friendly: a run directory whose data.txt already has >= EPOCHS rows
# is skipped, and a partial run restarts from its newest epoch checkpoint.
#
# Usage: scripts/run_sweep.sh [epochs] [rs values...]
set -e
cd "$(dirname "$0")/.."
EPOCHS=${1:-3000}
# SR solver (round 5: back to host-f64 solves — the round-4 chol default is
# DEMOTED: its boosted-damping fallback fires on every production step (the
# damped Fisher's condition number ~6e8 is beyond any f32 factorization), so
# every update ran at 33x the configured damping, leaking entropy at flat F
# (data/failed_r5_chol_extension/README.md).  The per-epoch Fisher pull that
# motivated chol is amortized instead: --fisher_refresh K ships the O(P^2)
# blocks every K epochs and solves against the cached f64 factorization
# (KFAC-style stale metric; optim/host_sr.HostFisherCache).
SR_SOLVER=${SR_SOLVER:-host64}
# K=32: steady epochs are 2.5 s and a refresh epoch ~18-23 s (single-core
# f64 dpotrf of the 5826^2 block + 68 MB D2H — PERF.md round-5 timing
# forensics), so K=32 amortizes to ~3.1 s/epoch; the 32-epoch-stale metric
# stays well inside the Fisher's own MC noise (the small quantum block
# ships fresh every epoch since round 5, so only the SPD classical factor
# is ever stale).
FISHER_REFRESH=${FISHER_REFRESH:-32}
shift || true
RS_LIST=${@:-"1.0 3.0 5.0"}
for rs in $RS_LIST; do
    echo "==== rs = $rs ===="
    # rs formatted via python str(float) to match main.py's run-dir naming
    # (rs_0.25 stays 0.25; every 1-decimal value is unchanged)
    rs_s=$(python3 -c "print(float('$rs'))")
    dir="data/interacting/n_29_dim_2_rs_${rs_s}_Theta_0.15_Emax_25_twist_0.250_0.250_nlayers_2_modelsize_16_nheads_4_nhidden_32_depth_2_spsize_16_tpsize_16_Gmax_15_kappa_10_mctherm_10_mcsteps_50_mcstddev_0.10_hutchinson_damping_0.00100_maxnorm_0.00100_batch_2048_ndevices_1_accsteps_4"
    finished=0
    if [ -f "$dir/data.txt" ]; then
        # last row's epoch; guard against empty/garbled final lines (a killed
        # run can leave a partial write) so the -ge test never aborts set -e
        finished=$(awk 'NF>0 && $1+0==$1 {last=$1} END {print last+0}' "$dir/data.txt")
        if [ "$finished" -ge "$EPOCHS" ]; then
            echo "rs=$rs already complete ($finished epochs) — skipping"
            continue
        fi
        # restart from the newest checkpoint at or below the logged epoch
        ckpt=$(ls "$dir"/epoch_*.pkl 2>/dev/null | sort | tail -1)
        if [ -n "$ckpt" ]; then
            finished=$(basename "$ckpt" | sed 's/epoch_0*\([0-9]*\)\.pkl/\1/')
            echo "resuming rs=$rs from epoch $finished"
            # drop rows logged past the checkpoint we resume from, or the
            # re-run epochs would be appended twice (ObservableLog appends on
            # resume) and the epoch column would go non-monotone
            awk -v e="$finished" 'NF>0 && $1+0<=e' "$dir/data.txt" > "$dir/data.txt.trim" \
                && mv "$dir/data.txt.trim" "$dir/data.txt"
            # sr_diag.txt appends on resume too: same trim (keep '#' tripwire
            # comment lines), so its epoch column stays monotone for forensics
            if [ -f "$dir/sr_diag.txt" ]; then
                awk -v e="$finished" '$1 !~ /^[0-9]/ || $1+0<=e' "$dir/sr_diag.txt" \
                    > "$dir/sr_diag.txt.trim" && mv "$dir/sr_diag.txt.trim" "$dir/sr_diag.txt"
            fi
        else
            finished=0
        fi
    fi
    # Retry loop for exit code 42: the step watchdog's reserved "device RPC
    # wedged" signal (utils/watchdog.py, round-5 pool stall).  Each retry
    # resumes from the newest epoch checkpoint; anything else aborts as
    # before (set -e).
    attempt=0
    while :; do
        rc=0
        python main.py --n 29 --rs "$rs" --Theta 0.15 --Emax 25 \
            --batch 2048 --acc_steps 4 --epoch "$EPOCHS" \
            --epoch_finished "$finished" \
            --sr --hutchinson --sr_solver "$SR_SOLVER" \
            --fisher_refresh "$FISHER_REFRESH" --tripwire_sigma 6 \
            --hang_timeout 600 \
            --folder data/interacting/ || rc=$?
        [ "$rc" -eq 0 ] && break
        attempt=$((attempt + 1))
        if [ "$rc" -ne 42 ] || [ "$attempt" -gt 3 ]; then
            echo "rs=$rs failed rc=$rc (attempt $attempt)"; exit "$rc"
        fi
        echo "rs=$rs hang detected (rc=42) — resuming from newest checkpoint (attempt $attempt)"
        ckpt=$(ls "$dir"/epoch_*.pkl 2>/dev/null | sort | tail -1)
        finished=0
        if [ -n "$ckpt" ]; then
            finished=$(basename "$ckpt" | sed 's/epoch_0*\([0-9]*\)\.pkl/\1/')
            awk -v e="$finished" 'NF>0 && $1+0<=e' "$dir/data.txt" > "$dir/data.txt.trim" \
                && mv "$dir/data.txt.trim" "$dir/data.txt"
            if [ -f "$dir/sr_diag.txt" ]; then
                awk -v e="$finished" '$1 !~ /^[0-9]/ || $1+0<=e' "$dir/sr_diag.txt" \
                    > "$dir/sr_diag.txt.trim" && mv "$dir/sr_diag.txt.trim" "$dir/sr_diag.txt"
            fi
        fi
    done
done
python -m coulombgas_tpu.analysis.plot data/interacting --S0 --out data/interacting/sweep_S_over_S0.png
