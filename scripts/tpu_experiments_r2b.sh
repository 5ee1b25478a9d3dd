#!/bin/bash
# Round-2 sweep B: hierarchical exact phase-1 + dense aggregation.
# Run alone (the axon tunnel serialises).  Results in /tmp/r2b_*.txt.
set -x
cd /root/repo

timeout 3000 python bench.py --candidates 32 --no-cpi256 --no-refine --stats \
  > /tmp/r2b_cs1024.txt 2>&1

timeout 3000 python bench.py --candidates 32 --cluster-size 512 --no-cpi256 --no-refine --stats \
  > /tmp/r2b_cs512.txt 2>&1

timeout 3000 python bench.py --candidates 32 --cluster-size 256 --no-cpi256 --no-refine --stats \
  > /tmp/r2b_cs256.txt 2>&1

timeout 3000 python scripts/profile_kernel.py --cluster-size 256 --candidates 32 \
  > /tmp/r2b_kernel_cs256.txt 2>&1

echo DONE
