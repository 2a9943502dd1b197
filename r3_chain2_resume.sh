#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE train lm (resume) ==="
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
