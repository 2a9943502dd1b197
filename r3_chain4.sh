#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE synth v4 (alpha=0.5, 20k extras, short cols) ==="
python -m kuzu.tools.production synth root=runs/production_v4 extra_cols=20000 || exit 1
echo "=== reuse v3 detectors (same appearance distribution; text-independent) ==="
mkdir -p runs/production_v4/runs/detect
cp -r runs/production_v3/runs/detect/col runs/production_v4/runs/detect/col
cp -r runs/production_v3/runs/detect/char runs/production_v4/runs/detect/char
echo "=== STAGE train lm ==="
python -m kuzu.tools.production train root=runs/production_v4 stage=lm lm_epochs=8 || exit 1
echo "=== STAGE train rec ==="
python -m kuzu.tools.production train root=runs/production_v4 stage=rec rec_epochs=14 || exit 1
echo "=== STAGE quality ==="
python -m kuzu.tools.production quality root=runs/production_v4
echo "=== STAGE bench ==="
python -m kuzu.tools.production bench root=runs/production_v4
echo "=== STAGE sample ==="
python -m kuzu.tools.production sample root=runs/production_v4
echo "=== CHAIN V4 DONE ==="
