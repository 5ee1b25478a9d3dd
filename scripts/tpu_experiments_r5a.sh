#!/bin/bash
# r5a: fused shade-emit epilogue + mt_tail re-measure — hardware A/B
# (r4 VERDICT items 1 and 3).  Production 63³ terrain config, P=16 for
# the A/B grid (r4 protocol), winners confirmed at P=128 + cpi256
# afterwards.  MUST own the box (no concurrent CPU jobs — CLAUDE.md).
set -x
cd /root/repo
exec 2>&1

echo "=== r5a baseline (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3

echo "=== r5a shade_emit (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3 --shade-emit

echo "=== r5a mt_tail (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3 --mt-tail

echo "=== r5a shade_emit + mt_tail (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3 --shade-emit --mt-tail

echo "=== r5a done"
