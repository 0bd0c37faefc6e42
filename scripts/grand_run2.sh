#!/bin/bash
set -x
cd /root/repo
mkdir -p benchmark_results logs
timeout 10000 python -u scripts/run_benchmark.py \
    --max-nobs 1800000 --full-matrix-max-nobs 90000 \
    --skip-existing --diffprec --diffprec-max-nobs 230000 \
    --out benchmark_results > logs/campaign2.log 2>&1
for i in 0 1 2; do
  timeout 7000 python -u scripts/tpu_capacity.py --only $i >> logs/capacity.log 2>&1
done
timeout 3000 python -u bench.py > logs/bench.log 2>&1
echo GRAND RUN 2 DONE
