#!/bin/bash
# Round-2 sweep C: nbuf-deep DMA prefetch + fan orders.  Run alone.
set -x
cd /root/repo
timeout 3000 python bench.py --candidates 32 --cluster-size 512 --no-cpi256 --no-refine --stats \
  > /tmp/r2c_cs512_raster.txt 2>&1
timeout 3000 python bench.py --candidates 32 --cluster-size 512 --fan-order morton2 --no-cpi256 --no-refine --stats \
  > /tmp/r2c_cs512_m2.txt 2>&1
timeout 3000 python bench.py --candidates 32 --cluster-size 256 --fan-order morton2 --no-cpi256 --no-refine --stats \
  > /tmp/r2c_cs256_m2.txt 2>&1
timeout 3000 python bench.py --candidates 32 --cluster-size 1024 --fan-order morton2 --no-cpi256 --no-refine --stats \
  > /tmp/r2c_cs1024_m2.txt 2>&1
echo DONE
