#!/bin/bash
# CTC recognizer continuation: 30 -> 60 epochs. e2e CER (0.038) now sits at
# the recognizer's own GT-crop ceiling (0.033-0.035) and the 30-epoch val
# curve was still improving (0.085/0.094/0.079 over the last three epochs),
# so the recognizer is the remaining quality lever. The resume loop rides
# through the host-RSS watchdog stops (tunnel transfer leak); best.ckpt
# selection means quality can only improve or hold. Re-measures quality +
# bench afterwards.
set -x
cd /root/repo
ROOT=runs/production_v4
TARGET=60

for i in 1 2 3 4 5 6; do
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
echo "=== CTC CONTINUATION DONE ($(date)) ==="
