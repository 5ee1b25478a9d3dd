#!/bin/bash
# r5b: headline refresh with sector-form miss windows + rcs_angles
# elision (P=8 A/B: 6.05 OFF/atan2 -> 6.12 ON/sector), then the
# on-hardware 1e-6 contract, then the in-situ stage-removal profile.
# Run alone (the axon tunnel serialises TPU processes).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r5b.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 3000 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# (a) production headline P=128 + cpi256 (current committed+sector code)
run python bench.py
# (b) on-hardware 1e-6 contract (reflection + dielectric variants)
run bash scripts/verify_contract.sh
# (c) in-situ stage-removal marginals (5 stages, fresh compiles)
run python scripts/profile_insitu.py
echo "R5B ALL DONE" >> "$LOG"
