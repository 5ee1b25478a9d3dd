#!/bin/bash
# r5d: running-best candidate-window prune (mt_prune) hardware A/B.
# Moving-shell scene is the target (r5b: 73% kernel+phase1, closed
# surfaces -> front-face hits occlude back faces); terrain checked for
# regression.  Owns the box.
set -x
cd /root/repo
exec 2>&1

echo "=== r5d moving baseline (P=8, patched kernel, prune OFF)"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3

echo "=== r5d moving mt_prune ON (P=8)"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3 --mt-prune --stats

echo "=== r5d terrain prune OFF (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3

echo "=== r5d terrain prune ON (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3 --mt-prune

echo "=== r5d done"
