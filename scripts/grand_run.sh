#!/bin/bash
# Sequential TPU campaign: one TPU process at a time (verify-skill rule).
set -x
cd /root/repo
mkdir -p benchmark_results logs
# 1. Full campaign + mixed-precision study (small problems get the full
#    16-config matrix; mid problems the pcg core; stats saved incrementally)
timeout 16000 python -u scripts/run_benchmark.py \
    --max-nobs 1800000 --full-matrix-max-nobs 90000 \
    --diffprec --diffprec-max-nobs 230000 \
    --out benchmark_results > logs/campaign.log 2>&1
# 2. Single-chip capacity: Venice-1350/1778 + Final-13682
timeout 9000 python -u scripts/tpu_capacity.py > logs/capacity.log 2>&1
# 3. bench.py (warms the exact programs the round driver will run)
timeout 3000 python -u bench.py > logs/bench.log 2>&1
echo GRAND RUN DONE
