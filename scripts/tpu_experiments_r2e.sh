#!/bin/bash
set -x
cd /root/repo
timeout 3000 python bench.py --candidates 32 --sub-tiles 8 --no-cpi256 --no-refine \
  > /tmp/r2f_st8.txt 2>&1
timeout 3000 python bench.py --candidates 32 --sub-tiles 16 --no-cpi256 --no-refine \
  > /tmp/r2f_st16.txt 2>&1
timeout 3000 python bench.py --candidates 32 --sub-tiles 8 --no-cpi256 \
  > /tmp/r2f_st8_refine.txt 2>&1
echo DONE
