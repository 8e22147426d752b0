#!/bin/bash
# Round-3 chip schedule, part B — chained manually after chip_queue_r3.sh.
set -u
cd "$(dirname "$0")/.."

echo "[queueB] start $(date)"

# 5. n=57 stage-1 on TPU with the proven n=49 recipe (VERDICT #6): host64 +
#    clip + tripwire descending through the f32 107.5 plateau toward the
#    reference 106.763.
timeout 10800 python -u scripts/pretrain_parity.py \
    --n 57 --Emax 49 --batch 8192 --epoch 600 \
    --folder data/parity_r3 --clip 5 --solver host64 \
    > /tmp/chip_n57_stage1.log 2>&1
echo "[queueB] n57 stage-1 done rc=$? $(date)"

# 6. BENCH_r03 sanity: confirm the carried-default step times beat BENCH_r01.
timeout 3600 python -u bench.py > /tmp/chip_bench_r3.log 2>&1
echo "[queueB] bench done rc=$? $(date)"

echo "[queueB] all done $(date)"
