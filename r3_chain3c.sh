#!/bin/bash
# Chain v3c: recover from the TPU-tunnel outage that killed chain3b at rec
# epoch 3. Waits for the TPU to come back, then resumes rec training and
# finishes quality/bench/sample.
set -x
cd /root/repo
echo "=== waiting for TPU ==="
until timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
  echo "$(date) tpu not ready, sleeping 180s"
  sleep 180
done
echo "=== TPU up: $(date) ==="
while [ -f /tmp/pytest.lock ]; do echo "waiting for pytest to finish"; sleep 60; done
echo "=== STAGE resume rec ==="
python -m kuzu.tools.production train root=runs/production_v3 stage=rec rec_epochs=30 rec_resume=1 || exit 1
echo "=== STAGE quality ==="
python -m kuzu.tools.production quality root=runs/production_v3
echo "=== STAGE bench ==="
python -m kuzu.tools.production bench root=runs/production_v3
echo "=== STAGE sample ==="
python -m kuzu.tools.production sample root=runs/production_v3
echo "=== CHAIN V3C DONE ==="
