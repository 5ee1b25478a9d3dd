#!/bin/bash
# r5f: final round-5 numbers at HEAD — every BASELINE config measured at
# the shipped defaults (r4 VERDICT item 8).  Owns the box.
set -x
cd /root/repo
exec 2>&1

echo "=== r5f config 4+5: terrain headline P=128 + cpi256 (HEAD)"
timeout 5400 python bench.py --repeat 3

echo "=== r5f config 2: moving (HEAD defaults incl. mt_prune)"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3

echo "=== r5f config 3: dielectric (HEAD)"
timeout 3600 python bench.py --scene dielectric --pulses 8 --repeat 3

echo "=== r5f config 1: single moving sphere target (HEAD)"
timeout 3600 python bench.py --scene sphere --tris 82000 --pulses 8 --repeat 3

echo "=== r5f done"
