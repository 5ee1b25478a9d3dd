#!/bin/bash
# r4d: emit-scatter removal A/B (post2 measured the aggregation marginal
# at 2.36 ms/pulse; the emit .at[match].set was the suspected bulk) +
# in-situ rest-block decomposition (profile_rest).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4d.log
: > "$LOG"
run() {
  echo "=== $* ===" >> "$LOG"
  timeout 3600 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}
# (a) emit fix, P=8 A/B vs 5.81e6
run python bench.py --pulses 8 --repeat 3 --no-cpi256
# (b) emit fix, production headline P=128 + cpi256
run python bench.py
echo "R4D ALL DONE" >> "$LOG"
