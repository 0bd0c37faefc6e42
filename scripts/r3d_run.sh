#!/bin/bash
# Covisibility-locality Venice rows (cached executables, fresh data):
# cs, cs_bf16w, and the non-cs config for the same locality problem.
set -x
cd /root/repo
for k in 0 2 4; do
  timeout 1800 python -u scripts/venice_matrix.py --problems 1 --only $k \
    --skip-existing --cam-window 0.05
done
echo R3D_DONE
