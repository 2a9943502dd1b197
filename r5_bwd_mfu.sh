#!/bin/bash
# Round-5 chip window 2: retry the per-node backward profile (the first
# attempt died on a transient tunnel FailedPrecondition at the RT probe),
# then the flagship train-step MFU sweep (batch/remat/conv_impl configs).
set -x
cd /root/repo
echo "=== BACKWARD PROFILE retry ($(date)) ==="
timeout 2700 python -m kuzu.tools.stem_profile model=yolov12x imgsz=640 \
  batch=8 grad=1 nodes=0,1,2,3,4,5,6,7,8,12,16,21
echo "=== MFU SWEEP ($(date)) ==="
timeout 4500 python r5_mfu_ab.py
echo "=== BWD+MFU DONE ($(date)) ==="
