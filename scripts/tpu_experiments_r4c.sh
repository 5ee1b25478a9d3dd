#!/bin/bash
# r4c: searchsorted compaction A/B at cs=128 (the r4b scatter variant was
# a LOSS: 5.45/5.49e6 vs the 5.79e6 argsort baseline) + post/agg/replay
# decomposition at the production config.
# Run alone (the axon tunnel serialises TPU processes).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4c.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# (a) searchsorted compaction, production defaults (vs argsort 5.788e6)
run python bench.py --pulses 8 --repeat 3 --no-cpi256
# (b) + rays-on-lanes phase 1 (searchsorted base)
run env RTS_P1_RL=1 python bench.py --pulses 8 --repeat 3 --no-cpi256
# (c) post/agg/replay marginals at the production config
run python scripts/profile_post2.py
echo "R4C ALL DONE" >> "$LOG"
