#!/bin/bash
# Round-2 continuation TPU batch (tunnel is up): runs serially
#   1. kernel tile-size sweep (C = 512 / 1024 / 2048), camera-sorted baseline
#   2. camera-scatter A/B sweep (C = 512 / 2048)
#   3. bench.py headline with the linearize kernel
#   4. bench.py with camera-scatter
#   5. Final-13682 single-chip capacity attempt
cd /root/repo

for C in 512 1024 2048; do
    echo "=== CHUNK=$C ===" >> logs/mv_sweep_r2i.log
    BA_PALLAS=1 BA_PALLAS_CHUNK=$C timeout 2400 \
        python -u scripts/tpu_mv_sweep.py >> logs/mv_sweep_r2i.log 2>&1
done
echo "[grand5] baseline sweep done $(date -u +%H:%M:%S)" >&2

for C in 512 2048; do
    echo "=== CAM_SCATTER=1 CHUNK=$C ===" >> logs/mv_sweep_r2j_camscatter.log
    BA_PALLAS=1 BA_CAM_SCATTER=1 BA_PALLAS_CHUNK=$C timeout 2400 \
        python -u scripts/tpu_mv_sweep.py \
        >> logs/mv_sweep_r2j_camscatter.log 2>&1
done
echo "[grand5] scatter sweep done $(date -u +%H:%M:%S)" >&2

timeout 3500 python -u bench.py > logs/bench_r2i_linkernel.log 2>&1
echo "[grand5] bench done $(date -u +%H:%M:%S)" >&2

BA_CAM_SCATTER=1 timeout 3500 python -u bench.py \
    > logs/bench_r2j_camscatter.log 2>&1
echo "[grand5] scatter bench done $(date -u +%H:%M:%S)" >&2

timeout 5400 python -u scripts/tpu_capacity.py --only 2 \
    > logs/capacity_r2i_final.log 2>&1
echo "[grand5] capacity done $(date -u +%H:%M:%S)" >&2
