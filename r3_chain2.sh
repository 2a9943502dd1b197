#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE production synth (v2) ==="
rm -rf runs/production
python -m kuzu.tools.production synth root=runs/production || exit 1
echo "=== STAGE train col ==="
python -m kuzu.tools.production train root=runs/production stage=col col_epochs=60 || exit 1
echo "=== STAGE train char ==="
python -m kuzu.tools.production train root=runs/production stage=char char_epochs=60 || exit 1
echo "=== STAGE train lm ==="
python -m kuzu.tools.production train root=runs/production stage=lm lm_epochs=30 || exit 1
echo "=== STAGE train rec ==="
python -m kuzu.tools.production train root=runs/production stage=rec rec_epochs=60 || exit 1
echo "=== STAGE quality ==="
python -m kuzu.tools.production quality root=runs/production
echo "=== STAGE bench ==="
python -m kuzu.tools.production bench root=runs/production
echo "=== STAGE sample ==="
python -m kuzu.tools.production sample root=runs/production
echo "=== CHAIN DONE ==="
