#!/bin/bash
# r4b: (a) O(L) replay compaction A/B (tree change, already in),
#      (b) rays-on-lanes phase-1 (RTS_P1_RL=1) A/B,
#      (c) cs=64 finer-gating exploration on top of RL.
# Baselines from r4a (P=8, 63^3): refine-on 5.788e6 (43.2 ms/pulse),
# no-refine 6.184e6, kernel LIVE 8.91 / DEAD 1.28, p1 LIVE 5.35 raw.
# Run alone (the axon tunnel serialises TPU processes).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r4b.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 2400 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# (a) replay cumsum compaction (same config as r4a run 1)
run python bench.py --pulses 8 --repeat 3 --no-cpi256
# (b) + rays-on-lanes phase 1
RTS_P1_RL=1 run env RTS_P1_RL=1 python bench.py --pulses 8 --repeat 3 --no-cpi256
# (b2) p1 live/dead split under RL
run env RTS_P1_RL=1 python scripts/profile_fixed.py
# (c) cs=64 G=16 fanout=16 (same 1024-wide window, 2x finer gating)
run env RTS_P1_RL=1 python bench.py --pulses 8 --repeat 3 --no-cpi256 \
  --cluster-size 64 --mt-group 16 --p1-fanout 16
# (c2) cs=64 with wider lists (more headroom for the finer clusters)
run env RTS_P1_RL=1 python bench.py --pulses 8 --repeat 3 --no-cpi256 \
  --cluster-size 64 --mt-group 16 --candidates 128 --p1-fanout 16
echo "R4B ALL DONE" >> "$LOG"
