#!/bin/bash
set -x
cd /root/repo
for g in A B D C; do
  timeout 3600 python -u scripts/tpu_final_abtest.py $g
done
echo R3E_ABTEST_DONE
