#!/bin/bash
# Round-4 chain: v5 synth regime (real-margin paper texture, ink bleed,
# stains — the round-3 real-page domain gap), col-detector extra pages
# (mAP50 0.89 was the weakest head), and the anti-collapse AR recognizer
# (joint CTC+attention ctc_weight=0.3 + scheduled sampling ss_prob=0.25).
# Stage order favors the VERDICT-2 experiment (AR rec) while keeping the
# cascade stages early enough that quality/bench always have weights.
set -x
cd /root/repo
mkdir -p runs
ROOT=runs/production_v5

echo "=== STAGE synth v5-regime ($(date)) ==="
python -m kuzu.tools.production synth root=$ROOT extra_cols=20000 col_extra_pages=150 || exit 1
echo "=== STAGE train lm ($(date)) ==="
python -m kuzu.tools.production train root=$ROOT stage=lm lm_epochs=8 || exit 1
echo "=== STAGE train col ($(date)) ==="
python -m kuzu.tools.production train root=$ROOT stage=col col_epochs=30 || exit 1
echo "=== STAGE train char ($(date)) ==="
python -m kuzu.tools.production train root=$ROOT stage=char char_epochs=36 || exit 1

# rec: anti-collapse AR — resume loop rides through host-RSS watchdog stops
TARGET=30
for i in 1 2 3 4 5 6; do
  echo "=== STAGE train rec chunk $i ($(date)) ==="
  python -m kuzu.tools.production train root=$ROOT stage=rec \
    rec_epochs=$TARGET rec_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/recognize/rec/results.csv | cut -d, -f1)
  echo "rec last epoch: $LAST"
  [ "$LAST" -ge $((TARGET - 1)) ] && break
done

echo "=== STAGE train ctc ($(date)) ==="
for i in 1 2 3; do
  python -m kuzu.tools.production train root=$ROOT stage=ctc \
    ctc_epochs=24 ctc_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/ctc/ctc/results.csv | cut -d, -f1)
  [ "$LAST" -ge 23 ] && break
done

echo "=== STAGE quality (ctc) ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=ctc
echo "=== STAGE quality (rec) ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=rec
echo "=== STAGE profile ($(date)) ==="
python -m kuzu.tools.production profile root=$ROOT rec=ctc
echo "=== STAGE bench ctc ($(date)) ==="
python -m kuzu.tools.production bench root=$ROOT rec=ctc
echo "=== STAGE sample ($(date)) ==="
python -m kuzu.tools.production sample root=$ROOT rec=ctc
echo "=== STAGE real-page eval ($(date)) ==="
python -m kuzu.tools.production real root=$ROOT rec=ctc
echo "=== CHAIN R4 DONE ($(date)) ==="
