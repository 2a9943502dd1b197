#!/bin/bash
# Round-5 post-chain chip window (run AFTER r5_rec_chain.sh frees the
# device): stem-variant A/B (VERDICT item 6 measurement), per-node
# backward profile (VERDICT item 4 deliverable), final bench sanity.
set -x
cd /root/repo
echo "=== STEM A/B ($(date)) ==="
timeout 2700 python r5_stem_ab.py
echo "=== BACKWARD PROFILE ($(date)) ==="
timeout 2400 python -m kuzu.tools.stem_profile model=yolov12x imgsz=640 \
  batch=8 grad=1 nodes=0,1,2,3,4,5,6,7,8,12,16,21
echo "=== BENCH ($(date)) ==="
timeout 900 python bench.py
echo "=== POSTCHAIN DONE ($(date)) ==="
