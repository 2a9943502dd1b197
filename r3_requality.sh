#!/bin/bash
# Re-measure the production cascade after the round-3 column-stage fix
# (col_conf=0.05 + same-region dedup) and the LM rescore length bucketing.
set -x
cd /root/repo
echo "=== quality rec=ctc ($(date)) ==="
python -m kuzu.tools.production quality root=runs/production_v4 rec=ctc
echo "=== profile rec=ctc ($(date)) ==="
python -m kuzu.tools.production profile root=runs/production_v4 rec=ctc
echo "=== bench rec=ctc ($(date)) ==="
python -m kuzu.tools.production bench root=runs/production_v4 rec=ctc
echo "=== sample rec=ctc ($(date)) ==="
python -m kuzu.tools.production sample root=runs/production_v4 rec=ctc
echo "=== REQUALITY DONE ($(date)) ==="
