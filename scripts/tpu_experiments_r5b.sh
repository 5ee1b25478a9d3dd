#!/bin/bash
# r5b: configs 2 (moving shells) and 3 (dielectric) get the terrain
# treatment (r4 VERDICT item 2): in-situ stage marginals + traversal
# workload counters, to build each scene's cost map / floor verdict.
# MUST own the box.
set -x
cd /root/repo
exec 2>&1

echo "=== r5b config 2 (moving) baseline + stats"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3 --stats

echo "=== r5b config 2 in-situ marginals"
timeout 5400 python scripts/profile_insitu.py --scene moving --pulses 8 --repeat 3

echo "=== r5b config 3 (dielectric) baseline + stats"
timeout 3600 python bench.py --scene dielectric --pulses 8 --repeat 3 --stats

echo "=== r5b config 3 in-situ marginals"
timeout 5400 python scripts/profile_insitu.py --scene dielectric --pulses 8 --repeat 3

echo "=== r5b done"
