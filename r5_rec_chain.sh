#!/bin/bash
# Round-5 tail: AR recognizer training (VERDICT item 2) driven with an
# explicit wall-clock budget, then quality(rec). Run after the evidence
# block; replaces r5_chain.sh's open-ended rec loop so the round ends
# with a measured quality(rec) no matter how far training got (the
# trainer checkpoints best/last every epoch).
# Usage: bash r5_rec_chain.sh <epochs> <deadline_epoch_seconds>
set -x
cd /root/repo
ROOT=runs/production_v5
EPOCHS=${1:-30}
DEADLINE=${2:-0}   # unix ts; 0 = no deadline

for i in 1 2 3 4 5 6; do
  echo "=== STAGE train rec chunk $i ($(date)) ==="
  python -m kuzu.tools.production train root=$ROOT stage=rec \
    rec_epochs=$EPOCHS rec_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || break
  LAST=$(tail -1 $ROOT/runs/recognize/rec/results.csv | cut -d, -f1)
  echo "rec last epoch: $LAST"
  [ "$LAST" -ge $((EPOCHS - 1)) ] && break
  if [ "$DEADLINE" != "0" ] && [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== deadline reached at epoch $LAST ==="
    break
  fi
done

echo "=== STAGE quality (rec) ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=rec
echo "=== REC CHAIN DONE ($(date)) ==="
