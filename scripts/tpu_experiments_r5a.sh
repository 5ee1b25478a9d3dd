#!/bin/bash
# r5a: rcs_angles elision A/B (aspect-free targets skip 6 atan2 chains +
# two [2,D,R] scatters per segment) + finer hit/miss decomposition.
# Run alone (the axon tunnel serialises TPU processes).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r5a.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# (a) P=8 A/B: auto (OFF for Iso targets) vs forced ON (warm baseline 6.04e6)
run python bench.py --pulses 8 --repeat 3 --no-cpi256
run python bench.py --pulses 8 --repeat 3 --no-cpi256 --rcs-angles on
# (b) finer hit/miss decomposition at the production config
run python scripts/profile_hit4.py
echo "R5A ALL DONE" >> "$LOG"
