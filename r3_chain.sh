#!/bin/bash
# round-3 chip chain: flash_train convergence validation, then the
# production-regime pipeline (synth -> train x4 -> quality -> bench -> sample)
set -x
cd /root/repo
echo "=== STAGE converge (flash_train default) ==="
python -m kuzu.tools.flagship converge root=runs/r3_synth epochs=60 batch=8 remat=true name=ft-converge exist_ok=true || exit 1
echo "=== STAGE production synth ==="
python -m kuzu.tools.production synth root=runs/production || exit 1
echo "=== STAGE train col ==="
python -m kuzu.tools.production train root=runs/production stage=col col_epochs=40 || exit 1
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
