#!/bin/bash
# r4a: fresh post-lanes-last cost map of the production config.
# Run alone (the axon tunnel serialises TPU processes).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4a.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# 1. production totals at P=8 (decomposition scale) with/without replay
run python bench.py --pulses 8 --repeat 3 --no-cpi256
run python bench.py --pulses 8 --repeat 3 --no-cpi256 --no-refine
run python bench.py --pulses 8 --repeat 3 --no-cpi256 --no-refine --agg-cap 0
# 2. phase-1 / kernel live+dead split (seg-1 shapes)
run python scripts/profile_fixed.py
# 3. hit-body decomposition (post lanes-last)
run python scripts/profile_hitsplit.py
# 4. shading/body extras decomposition
run python scripts/profile_shading3.py
echo "R4A ALL DONE" >> "$LOG"
