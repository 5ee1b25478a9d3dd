#!/bin/bash
# Round-2 kernel experiments on the tunnelled TPU (run ONE at a time —
# the axon tunnel serialises).  Results land in /tmp/r2_bench_*.txt.
# Compiles are remote and slow; the persistent cache (/tmp/jax_cache)
# makes repeat configs cheap.
set -x
cd /root/repo

# control: old hierarchical sweep (round-1 configuration)
timeout 3000 python bench.py --candidates 0 --no-cpi256 --no-refine \
  > /tmp/r2_bench_sweep.txt 2>&1

# two-phase candidates, round-1 cluster size
timeout 3000 python bench.py --candidates 64 --no-cpi256 --no-refine --stats \
  > /tmp/r2_bench_cand_cs1024.txt 2>&1

# finer clusters (less MT waste per processed cluster)
timeout 3000 python bench.py --candidates 64 --cluster-size 512 --no-cpi256 --no-refine --stats \
  > /tmp/r2_bench_cand_cs512.txt 2>&1

timeout 3000 python bench.py --candidates 96 --cluster-size 256 --no-cpi256 --no-refine --stats \
  > /tmp/r2_bench_cand_cs256.txt 2>&1

echo DONE
