#!/bin/bash
# r5e: moving-scene knob re-sweep under mt_prune (the prune changes the
# cs/G tradeoff: pruned back-face windows no longer pay for coarser
# clusters).  Owns the box.
set -x
cd /root/repo
exec 2>&1
echo "=== r5e moving cs512 cand128 G1 (prune on via scene default)"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3 --cluster-size 512
echo "=== r5e moving cs1024 G2"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3 --mt-group 2
echo "=== r5e moving cs512 G2"
timeout 3600 python bench.py --scene moving --pulses 8 --repeat 3 --cluster-size 512 --mt-group 2
echo "=== r5e dielectric mt_prune ON"
timeout 3600 python bench.py --scene dielectric --pulses 8 --repeat 3 --mt-prune
echo "=== r5e done"
