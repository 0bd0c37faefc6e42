#!/bin/bash
# Round-2 late TPU batch #2 (after grand_run3): A/B the camera-scatter
# mode (BA_CAM_SCATTER=1 — point-sorted streams + persistent VMEM
# accumulator; no camera-sorted W/JR copies, no (8, n) operand gather)
# against the camera-sorted baseline, at two chunk sizes, plus an
# end-to-end bench.  One TPU process at a time; waits for grand_run3.
cd /root/repo

echo "[grand4] waiting for grand_run3 to finish..." >&2
while pgrep -f "grand_run3.sh" > /dev/null 2>&1; do
    sleep 120
done
echo "[grand4] grand3 done $(date -u +%H:%M:%S); waiting for tunnel..." >&2
until timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    sleep 120
    echo "[grand4] still waiting $(date -u +%H:%M:%S)" >&2
done
echo "[grand4] tunnel up $(date -u +%H:%M:%S)" >&2

for C in 512 2048; do
    echo "=== CAM_SCATTER=1 CHUNK=$C ===" >> logs/mv_sweep_r2j_camscatter.log
    BA_PALLAS=1 BA_CAM_SCATTER=1 BA_PALLAS_CHUNK=$C timeout 2400 \
        python -u scripts/tpu_mv_sweep.py \
        >> logs/mv_sweep_r2j_camscatter.log 2>&1
done
echo "[grand4] scatter sweep done $(date -u +%H:%M:%S)" >&2

BA_CAM_SCATTER=1 timeout 3500 python -u bench.py \
    > logs/bench_r2j_camscatter.log 2>&1
echo "[grand4] bench done $(date -u +%H:%M:%S)" >&2
