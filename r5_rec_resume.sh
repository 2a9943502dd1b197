#!/bin/bash
# Round-5: resume the AR recognizer from epoch 13 (val CER 0.109, still
# improving ~0.015/epoch at cutoff) under a fresh wall-clock budget, then
# re-measure quality(rec) with the improved weights, then run the
# post-chain chip window (stem A/B, backward profile, bench).
# Usage: bash r5_rec_resume.sh <epochs> <time_budget_hours>
set -x
cd /root/repo
ROOT=runs/production_v5
EPOCHS=${1:-60}
BUDGET_H=${2:-1.8}
T0=$(date +%s)

for i in 1 2 3 4; do
  echo "=== STAGE resume rec chunk $i ($(date)) ==="
  LEFT_H=$(python -c "import time;print(max(0.05, $BUDGET_H - (time.time()-$T0)/3600))")
  python -m kuzu.tools.production train root=$ROOT stage=rec \
    rec_epochs=$EPOCHS rec_time_h=$LEFT_H rec_resume=1 || break
  LAST=$(tail -1 $ROOT/runs/recognize/rec/results.csv | cut -d, -f1)
  echo "rec last epoch: $LAST"
  [ "$LAST" -ge $((EPOCHS - 1)) ] && break
  ELAPSED_H=$(python -c "import time;print((time.time()-$T0)/3600)")
  python -c "exit(0 if $ELAPSED_H >= $BUDGET_H else 1)" && break
done

echo "=== STAGE quality (rec, resumed) ($(date)) ==="
timeout 2700 python -m kuzu.tools.production quality root=$ROOT rec=rec

echo "=== POSTCHAIN ($(date)) ==="
bash r5_postchain.sh
echo "=== REC RESUME CHAIN DONE ($(date)) ==="
