#!/bin/bash
# Round-3 follow-up batch: the 4 Venice linesearch rows that OOMed
# before the lax.map serialization fix, then the Final-13682 retry
# (first attempt predated the assembly-OOM barrier fix).
set -x
cd /root/repo
for k in 5 7 13 15; do
  timeout 3600 python -u scripts/venice_matrix.py --only $k --skip-existing
done
timeout 5400 python -u scripts/tpu_capacity.py --only 2
echo R3B_DONE
