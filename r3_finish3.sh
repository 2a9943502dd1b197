#!/bin/bash
set -x
cd /root/repo
echo "=== STAGE quality (v3, epoch-3 rec: LM-shortcut regime) ==="
python -m kuzu.tools.production quality root=runs/production_v3
echo "=== STAGE bench ==="
python -m kuzu.tools.production bench root=runs/production_v3
echo "=== STAGE sample ==="
python -m kuzu.tools.production sample root=runs/production_v3
echo "=== V3 FINISH DONE ==="
