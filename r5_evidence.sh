#!/bin/bash
set -x
cd /root/repo
ROOT=runs/production_v5
echo "=== STAGE quality (ctc) ($(date)) ==="
timeout 2400 python -m kuzu.tools.production quality root=$ROOT rec=ctc
echo "=== STAGE bench ctc ($(date)) ==="
timeout 1800 python -m kuzu.tools.production bench root=$ROOT rec=ctc
echo "=== STAGE real-page eval ($(date)) ==="
timeout 1800 python -m kuzu.tools.production real root=$ROOT rec=ctc
echo "=== STAGE profile (ctc) ($(date)) ==="
timeout 1800 python -m kuzu.tools.production profile root=$ROOT rec=ctc
echo "=== STAGE sample ($(date)) ==="
timeout 1200 python -m kuzu.tools.production sample root=$ROOT rec=ctc
echo "=== EVIDENCE BLOCK DONE ($(date)) ==="
