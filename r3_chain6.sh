#!/bin/bash
# Chain v6: finish the v5 production run after the host-OOM diagnosis.
# v5 died at rec epoch 7: the tunnel client retains every host->device
# transfer (~1:1 bytes), and the float32 image pipeline shipped 12.6 MB/step.
# Fixes in place: uint8 image transport (4x less) + on-device photometric
# aug + the trainer's host-RSS watchdog (checkpoints and exits cleanly at
# 85% RAM; resume=1 continues in a fresh process).
set -x
cd /root/repo
mkdir -p runs
ROOT=runs/production_v4
TARGET=40

# rec: resume from the v5 epoch-7 checkpoint up to epoch $TARGET; every rerun
# is idempotent (resume from last; no-op once epochs are done), so the loop
# rides through watchdog stops.
for i in 1 2 3 4 5 6; do
  echo "=== STAGE train rec chunk $i ($(date)) ==="
  python -m kuzu.tools.production train root=$ROOT stage=rec \
    rec_epochs=$TARGET rec_resume=1 || exit 1
  LAST=$(tail -1 $ROOT/runs/recognize/rec/results.csv | cut -d, -f1)
  echo "rec last epoch: $LAST"
  [ "$LAST" -ge $((TARGET - 1)) ] && break
done

echo "=== STAGE quality ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT
echo "=== STAGE profile ($(date)) ==="
python -m kuzu.tools.production profile root=$ROOT
echo "=== STAGE bench ($(date)) ==="
python -m kuzu.tools.production bench root=$ROOT
echo "=== STAGE sample ($(date)) ==="
python -m kuzu.tools.production sample root=$ROOT
echo "=== CHAIN V6 DONE ($(date)) ==="
