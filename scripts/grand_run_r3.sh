#!/bin/bash
# Round-3 grand TPU batch: Final-13682 capacity, then the Venice/Trafalgar
# solver matrix (one config per process for crash isolation; TPU worker
# crashes have no in-process recovery). Logs under logs/grand_r3/.
cd /root/repo
mkdir -p logs/grand_r3
set -x

# 1. Final-13682 (chunked driver, bf16 W, scatter-assembly fallback)
timeout 5400 python -u scripts/tpu_capacity.py --only 2 \
    > logs/grand_r3/final13682.log 2>&1

# 2. Trafalgar-257 matrix (8 configs, small/fast)
for k in $(seq 16 23); do
    timeout 1800 python -u scripts/venice_matrix.py --only $k --skip-existing \
        >> logs/grand_r3/trafalgar_matrix.log 2>&1
done

# 3. Venice-1778 matrix (8 configs)
for k in $(seq 8 15); do
    timeout 3600 python -u scripts/venice_matrix.py --only $k --skip-existing \
        >> logs/grand_r3/venice1778_matrix.log 2>&1
done

# 4. Venice-1350 matrix (8 configs)
for k in $(seq 0 7); do
    timeout 3600 python -u scripts/venice_matrix.py --only $k --skip-existing \
        >> logs/grand_r3/venice1350_matrix.log 2>&1
done

echo GRAND_R3_DONE
