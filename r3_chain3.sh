#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE synth v3 ==="
python -m kuzu.tools.production synth root=runs/production_v3 extra_cols=6000 || exit 1
echo "=== STAGE train col (reg_max=32) ==="
python -m kuzu.tools.production train root=runs/production_v3 stage=col col_epochs=50 || exit 1
echo "=== STAGE train char ==="
python -m kuzu.tools.production train root=runs/production_v3 stage=char char_epochs=25 || exit 1
echo "=== STAGE train lm ==="
python -m kuzu.tools.production train root=runs/production_v3 stage=lm lm_epochs=12 || exit 1
echo "=== STAGE train rec ==="
python -m kuzu.tools.production train root=runs/production_v3 stage=rec rec_epochs=25 || exit 1
echo "=== STAGE quality ==="
python -m kuzu.tools.production quality root=runs/production_v3
echo "=== STAGE bench ==="
python -m kuzu.tools.production bench root=runs/production_v3
echo "=== STAGE sample ==="
python -m kuzu.tools.production sample root=runs/production_v3
echo "=== CHAIN V3 DONE ==="
