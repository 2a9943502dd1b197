#!/bin/bash
# Round-5 tail: AR recognizer training (VERDICT item 2) driven with an
# explicit wall-clock budget, then quality(rec). Run after the evidence
# block; the trainer's own `time` budget (rec_time_h) bounds the run
# inside one process (checkpointing best/last every epoch), and the
# resume loop only exists to survive an RSS-watchdog stop.
# Usage: bash r5_rec_chain.sh <epochs> <time_budget_hours>
set -x
cd /root/repo
ROOT=runs/production_v5
EPOCHS=${1:-60}
BUDGET_H=${2:-1.25}
T0=$(date +%s)

for i in 1 2 3; do
  echo "=== STAGE train rec chunk $i ($(date)) ==="
  LEFT_H=$(python -c "import time;print(max(0.05, $BUDGET_H - (time.time()-$T0)/3600))")
  python -m kuzu.tools.production train root=$ROOT stage=rec \
    rec_epochs=$EPOCHS rec_time_h=$LEFT_H \
    rec_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || break
  LAST=$(tail -1 $ROOT/runs/recognize/rec/results.csv | cut -d, -f1)
  echo "rec last epoch: $LAST"
  [ "$LAST" -ge $((EPOCHS - 1)) ] && break
  ELAPSED_H=$(python -c "import time;print((time.time()-$T0)/3600)")
  python -c "exit(0 if $ELAPSED_H >= $BUDGET_H else 1)" && break
done

echo "=== STAGE quality (rec) ($(date)) ==="
timeout 2400 python -m kuzu.tools.production quality root=$ROOT rec=rec
echo "=== REC CHAIN DONE ($(date)) ==="
