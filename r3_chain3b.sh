#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE train rec (adamw fix, fresh) ==="
rm -rf runs/production_v3/runs/recognize/rec
python -m kuzu.tools.production train root=runs/production_v3 stage=rec rec_epochs=30 || exit 1
echo "=== STAGE quality ==="
python -m kuzu.tools.production quality root=runs/production_v3
echo "=== STAGE bench ==="
python -m kuzu.tools.production bench root=runs/production_v3
echo "=== STAGE sample ==="
python -m kuzu.tools.production sample root=runs/production_v3
echo "=== CHAIN V3B DONE ==="
