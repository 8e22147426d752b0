#!/bin/bash
# rs-sweep driver: n=29 interacting runs across the coupling sweep, run
# sequentially on the local chip, then the analysis pipeline
# (python -m coulombgas_tpu.analysis.plot) over the results.
# Reference comparison logs: /root/reference/data/n_29_dim_2_rs_*.
#
# Usage: scripts/run_sweep.sh [epochs] [rs values...]
set -e
cd "$(dirname "$0")/.."
EPOCHS=${1:-3000}
shift || true
RS_LIST=${@:-"1.0 3.0 5.0"}
for rs in $RS_LIST; do
    echo "==== rs = $rs ===="
    python main.py --n 29 --rs "$rs" --Theta 0.15 --Emax 25 \
        --batch 2048 --acc_steps 4 --epoch "$EPOCHS" \
        --sr --hutchinson --folder data/interacting/
done
python -m coulombgas_tpu.analysis.plot data/interacting --S0 --out data/interacting/sweep_S_over_S0.png
