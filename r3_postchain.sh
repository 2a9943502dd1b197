#!/bin/bash
# post-chain-v3 on-chip checks: headline bench still green + summary pull
set -x
cd /root/repo
python bench.py
grep -E "\{\"(col|char|lm|rec)\"|det_map50|pages_per_s|e2e_cer|CHAIN" runs/r3_chain3.log | tail -12
