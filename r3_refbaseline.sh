#!/bin/bash
# Wait for the CTC continuation chain to release the (single) host core,
# then measure the reference pipeline's CPU latency baseline.
set -x
cd /root/repo
if [ -f /tmp/ctc_cont.pid ]; then
  while kill -0 "$(cat /tmp/ctc_cont.pid)" 2>/dev/null; do sleep 120; done
fi
sleep 10
python probe_reference_cpu.py
echo "=== REFERENCE CPU BASELINE DONE ($(date)) ==="
