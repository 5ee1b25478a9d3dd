#!/bin/bash
# Round-2 sweep D: gating granularity.  Run alone.
set -x
cd /root/repo
timeout 3000 python bench.py --candidates 32 --cluster-size 256 --sub-tiles 4 --no-cpi256 --no-refine \
  > /tmp/r2d_cs256_st4.txt 2>&1
timeout 3000 python bench.py --candidates 32 --cluster-size 256 --sub-tiles 8 --no-cpi256 --no-refine \
  > /tmp/r2d_cs256_st8.txt 2>&1
timeout 3000 python bench.py --candidates 32 --cluster-size 512 --sub-tiles 8 --no-cpi256 --no-refine \
  > /tmp/r2d_cs512_st8.txt 2>&1
timeout 3000 python bench.py --candidates 32 --cluster-size 256 --sub-tiles 8 --ray-tile 256 --no-cpi256 --no-refine \
  > /tmp/r2d_cs256_rt256_st8.txt 2>&1
echo DONE
