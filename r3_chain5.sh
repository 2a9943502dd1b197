#!/bin/bash
# Chain v5: full from-scratch production run in the fresh container
# (v4 synth regime: alpha=0.5 bigram text, 20k standalone rec columns,
#  v3 detector fixes: col @1280 reg_max=32, char tiled @640).
# Every prior runs/ artifact was wiped with the container, so all four
# stages train from scratch.
set -x
cd /root/repo
mkdir -p runs
echo "=== STAGE synth v4-regime ($(date)) ==="
python -m kuzu.tools.production synth root=runs/production_v4 extra_cols=20000 || exit 1
echo "=== STAGE train col ($(date)) ==="
python -m kuzu.tools.production train root=runs/production_v4 stage=col col_epochs=50 || exit 1
echo "=== STAGE train char ($(date)) ==="
python -m kuzu.tools.production train root=runs/production_v4 stage=char char_epochs=40 || exit 1
echo "=== STAGE train lm ($(date)) ==="
python -m kuzu.tools.production train root=runs/production_v4 stage=lm lm_epochs=8 || exit 1
echo "=== STAGE train rec ($(date)) ==="
python -m kuzu.tools.production train root=runs/production_v4 stage=rec rec_epochs=14 || exit 1
echo "=== STAGE quality ($(date)) ==="
python -m kuzu.tools.production quality root=runs/production_v4
echo "=== STAGE bench ($(date)) ==="
python -m kuzu.tools.production bench root=runs/production_v4
echo "=== STAGE sample ($(date)) ==="
python -m kuzu.tools.production sample root=runs/production_v4
echo "=== CHAIN V5 DONE ($(date)) ==="
