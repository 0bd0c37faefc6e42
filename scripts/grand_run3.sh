#!/bin/bash
# Round-2 late TPU batch: waits for the tunnel, then runs (serially, one
# TPU process at a time):
#   1. kernel tile-size sweep (C = 512 / 1024 / 2048)
#   2. bench.py headline with the linearize kernel
#   3. Final-13682 single-chip capacity attempt (fallback path, bf16 W)
cd /root/repo

echo "[grand3] waiting for TPU tunnel..." >&2
until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    sleep 120
    echo "[grand3] still waiting $(date -u +%H:%M:%S)" >&2
done
echo "[grand3] tunnel up $(date -u +%H:%M:%S)" >&2

for C in 512 1024 2048; do
    echo "=== CHUNK=$C ===" >> logs/mv_sweep_r2i.log
    BA_PALLAS=1 BA_PALLAS_CHUNK=$C timeout 2400 \
        python -u scripts/tpu_mv_sweep.py >> logs/mv_sweep_r2i.log 2>&1
done
echo "[grand3] sweep done $(date -u +%H:%M:%S)" >&2

timeout 3500 python -u bench.py > logs/bench_r2i_linkernel.log 2>&1
echo "[grand3] bench done $(date -u +%H:%M:%S)" >&2

timeout 5400 python -u scripts/tpu_capacity.py --only 2 \
    > logs/capacity_r2i_final.log 2>&1
echo "[grand3] capacity done $(date -u +%H:%M:%S)" >&2
