#!/bin/bash
# r5c: headline re-measure at the new production defaults (mt_tail), the
# on-hardware 1e-6 contract at the updated preset, then the r5b config
# 2/3 analysis runs.  Owns the box.
set -x
cd /root/repo
exec 2>&1

echo "=== r5c production headline (P=128, 63^3 + cpi256)"
timeout 5400 python bench.py --repeat 3

echo "=== r5c on-hardware contract (production preset incl. mt_tail)"
timeout 5400 bash scripts/verify_contract.sh

echo "=== r5c done; starting r5b"
bash scripts/tpu_experiments_r5b.sh
