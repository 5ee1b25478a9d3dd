#!/bin/bash
# r6c: 31^3 cpi256-config in-situ profile (what dominates the 9.3
# ms/pulse toward the <2 s goal), final headline refresh at HEAD, and
# the on-hardware 1e-6 contract at the target-major clustering codegen.
# Run alone (tunnel serialises; 1-CPU box — no concurrent CPU work).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r6c.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 3600 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# (a) in-situ stage marginals at the cpi256 config (31^3, rt256/st4,
#     refine ON like the tracked metric)
run python scripts/profile_insitu.py --rays 31 --pulses 64 --repeat 5 --ray-tile 256 --sub-tiles 4 --refine
# (b) full production bench at HEAD (P=128 headline + auto-rt256 cpi256)
run python bench.py
# (c) on-hardware 1e-6 contract at the new clustering
run bash scripts/verify_contract.sh
echo "R6C ALL DONE" >> "$LOG"
