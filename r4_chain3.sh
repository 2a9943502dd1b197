#!/bin/bash
# Round-4 chain, part 3: ran after stopping the CTC loop early (CER
# converged fast; wall clock reserved for the AR-rec experiment).
# Evals use the best CTC checkpoint on disk.
set -x
cd /root/repo
ROOT=runs/production_v5

echo "=== STAGE quality (ctc) ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=ctc
echo "=== STAGE profile (ctc) ($(date)) ==="
python -m kuzu.tools.production profile root=$ROOT rec=ctc
echo "=== STAGE bench ctc ($(date)) ==="
python -m kuzu.tools.production bench root=$ROOT rec=ctc
echo "=== STAGE sample ($(date)) ==="
python -m kuzu.tools.production sample root=$ROOT rec=ctc
echo "=== STAGE real-page eval ($(date)) ==="
python -m kuzu.tools.production real root=$ROOT rec=ctc

# AR-rec experiment (VERDICT #2)
TARGET=30
for i in 1 2 3 4 5 6; do
  echo "=== STAGE train rec chunk $i ($(date)) ==="
  python -m kuzu.tools.production train root=$ROOT stage=rec \
    rec_epochs=$TARGET rec_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/recognize/rec/results.csv | cut -d, -f1)
  echo "rec last epoch: $LAST"
  [ "$LAST" -ge $((TARGET - 1)) ] && break
done
echo "=== STAGE quality (rec) ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=rec
echo "=== CHAIN R4-3 DONE ($(date)) ==="
