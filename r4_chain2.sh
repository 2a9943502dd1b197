#!/bin/bash
# Round-4 chain, part 2: picks up after synth/lm/col/char (r4_chain.sh was
# relaunched at the char->rec boundary to train CTC FIRST — it is the
# production recommendation and drives quality/bench; the AR-rec
# experiment runs after with whatever wall clock remains).
set -x
cd /root/repo
ROOT=runs/production_v5

echo "=== STAGE train ctc ($(date)) ==="
for i in 1 2 3; do
  python -m kuzu.tools.production train root=$ROOT stage=ctc \
    ctc_epochs=24 ctc_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/ctc/ctc/results.csv | cut -d, -f1)
  [ "$LAST" -ge 23 ] && break
done

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

# AR-rec experiment (VERDICT #2): joint CTC+attention + scheduled sampling
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
echo "=== CHAIN R4-2 DONE ($(date)) ==="
