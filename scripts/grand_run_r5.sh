#!/bin/bash
# Round-5 campaign: full ladder + mixed-precision study on the round-5
# code (VERDICT r4 directive #3), crash-resumable, then the Venice
# first_order re-run on current code.
cd /root/repo
for attempt in 1 2 3 4 5; do
    echo "[grand-r5] campaign attempt $attempt $(date -u +%H:%M:%S)" \
        >> logs/campaign_r5.log
    BA_CAM_SCATTER=1 timeout 16000 python -u scripts/run_benchmark.py \
        --skip-existing --diffprec >> logs/campaign_r5.log 2>&1 \
        && break
    sleep 30
done
echo "[grand-r5] campaign done $(date -u +%H:%M:%S)" >> logs/campaign_r5.log
BA_CAM_SCATTER=1 timeout 3000 python -u scripts/venice_firstorder.py 1e-6 \
    >> logs/venice_firstorder_r5.log 2>&1
echo "[grand-r5] ALL DONE $(date -u +%H:%M:%S)" >> logs/campaign_r5.log
