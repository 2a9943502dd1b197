#!/bin/bash
# Chain v4b: synth-v4 production run, resilient to the TPU-tunnel outage.
# Synth is jax-free (runs on CPU immediately after the pytest lock clears);
# the device stages wait for the TPU tunnel to come back first.
set -x
cd /root/repo
while [ -f /tmp/pytest.lock ]; do echo "waiting for pytest"; sleep 60; done
echo "=== STAGE synth v4 (alpha=0.5, 20k extras, short cols) ==="
python -m kuzu.tools.production synth root=runs/production_v4 extra_cols=20000 || exit 1
echo "=== reuse v3 detectors (same appearance distribution; text-independent) ==="
mkdir -p runs/production_v4/runs/detect
cp -r runs/production_v3/runs/detect/col runs/production_v4/runs/detect/col
cp -r runs/production_v3/runs/detect/char runs/production_v4/runs/detect/char
echo "=== waiting for TPU ==="
until timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; do
  echo "$(date) tpu not ready, sleeping 180s"
  sleep 180
done
echo "=== TPU up: $(date) ==="
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
echo "=== CHAIN V4B DONE ==="
