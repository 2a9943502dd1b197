#!/bin/bash
# Round-5 chain: re-run the committed v5 regime end-to-end and PUBLISH the
# measurements round 4 lost to the container recycle (VERDICT r4 item 1).
# Evidence-first ordering: every eval (quality/bench/real) runs as soon as
# its weights exist, so a mid-round host loss still leaves numbers in the
# git-tracked results/ ledger. Resume loops ride through the host-RSS
# watchdog on every long stage.
set -x
cd /root/repo
mkdir -p runs
ROOT=runs/production_v5

echo "=== STAGE synth v5-regime ($(date)) ==="
python -m kuzu.tools.production synth root=$ROOT extra_cols=20000 col_extra_pages=150 || exit 1

echo "=== STAGE train lm ($(date)) ==="
python -m kuzu.tools.production train root=$ROOT stage=lm lm_epochs=8 || exit 1

echo "=== STAGE train col ($(date)) ==="
for i in 1 2 3; do
  python -m kuzu.tools.production train root=$ROOT stage=col \
    col_epochs=30 col_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/detect/col/results.csv | cut -d, -f1)
  [ "$LAST" -ge 29 ] && break
done

echo "=== STAGE train char ($(date)) ==="
for i in 1 2 3 4; do
  python -m kuzu.tools.production train root=$ROOT stage=char \
    char_epochs=36 char_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/detect/char/results.csv | cut -d, -f1)
  [ "$LAST" -ge 35 ] && break
done

echo "=== STAGE train ctc ($(date)) ==="
for i in 1 2 3; do
  python -m kuzu.tools.production train root=$ROOT stage=ctc \
    ctc_epochs=20 ctc_resume=$([ $i -gt 1 ] && echo 1 || echo 0) || exit 1
  LAST=$(tail -1 $ROOT/runs/ctc/ctc/results.csv | cut -d, -f1)
  [ "$LAST" -ge 19 ] && break
done

# Evidence block — runs the moment CTC weights exist (VERDICT items 1a/1b/1c)
echo "=== STAGE quality (ctc) ($(date)) ==="
python -m kuzu.tools.production quality root=$ROOT rec=ctc
echo "=== STAGE bench ctc ($(date)) ==="
python -m kuzu.tools.production bench root=$ROOT rec=ctc
echo "=== STAGE real-page eval ($(date)) ==="
python -m kuzu.tools.production real root=$ROOT rec=ctc
echo "=== STAGE profile (ctc) ($(date)) ==="
python -m kuzu.tools.production profile root=$ROOT rec=ctc
echo "=== STAGE sample ($(date)) ==="
python -m kuzu.tools.production sample root=$ROOT rec=ctc
echo "=== EVIDENCE BLOCK DONE ($(date)) ==="

# AR-rec experiment (VERDICT r4 item 2): joint CTC+attention + scheduled
# sampling, LM-grafted decoder. Chunked to ride through watchdog stops.
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
echo "=== CHAIN R5 DONE ($(date)) ==="
