#!/bin/bash
set -x
cd /root/repo
timeout 3000 python bench.py --replay-cap 1024 --no-cpi256 > /tmp/r2g_cap1024.txt 2>&1
timeout 3000 python bench.py --rays 63 --pulses 8 --no-cpi256 --no-refine > /tmp/r2g_rays63.txt 2>&1
echo DONE
