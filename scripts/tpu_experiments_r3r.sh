#!/bin/bash
# Round-3 session R: packed kernel I/O (RTS_KERNEL_PACKED_IO) hardware
# validation + production bench at the new default, then the optimized-
# HLO byte attribution for the engine-layout work (Stage B).
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== packed-I/O kernel: live + dead floor (default = packed) ==="
timeout 4000 python -u scripts/profile_packedio.py 2>&1 | grep --line-buffered -v Warning
echo R3R_PACKED_DONE; date

echo "=== production bench 63^3 + cpi256 (packed) ==="
timeout 7000 python -u bench.py --cpi256 2>&1 | grep --line-buffered -v Warning
echo R3R_BENCH_DONE; date

echo "=== optimized-HLO cost attribution (production CPI, P=8) ==="
timeout 4000 python -u scripts/profile_cost.py 2>&1 | grep --line-buffered -v Warning
echo R3R_DONE; date
