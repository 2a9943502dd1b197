#!/bin/bash
# CTC recognizer A/B on the v4 production data. The AR TrOCR plateaued at
# val CER ~0.90 (teacher-forced token_acc keeps climbing while free-running
# decode collapses: the 4,783-char vocab leaves ~19 instances/class — too
# few for an AR decoder to ground visually). The CTC CRNN has monotonic
# image alignment and no text prior — train it on the SAME columns
# (column_info.csv) and run quality/bench with rec=ctc for the A/B.
set -x
cd /root/repo
mkdir -p runs
# wait for chain6 (if still running) to release the chip
if [ -f /tmp/chain6.pid ]; then
  while kill -0 "$(cat /tmp/chain6.pid)" 2>/dev/null; do sleep 60; done
fi
ROOT=runs/production_v4
TARGET=30

# resume loop rides through the host-RSS watchdog stops (tunnel leak)
for i in 1 2 3 4; do
  echo "=== STAGE train ctc chunk $i ($(date)) ==="
  python -m kuzu.tools.production train root=$ROOT stage=ctc \
    ctc_epochs=$TARGET ctc_resume=1 || exit 1
  LAST=$(tail -1 $ROOT/runs/ctc/ctc/results.csv | cut -d, -f1)
  echo "ctc last epoch: $LAST"
  [ "$LAST" -ge $((TARGET - 1)) ] && break
done

echo "=== STAGE quality rec=ctc ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=ctc
echo "=== STAGE bench rec=ctc ($(date)) ==="
python -m kuzu.tools.production bench root=$ROOT rec=ctc
echo "=== CTC A/B DONE ($(date)) ==="
