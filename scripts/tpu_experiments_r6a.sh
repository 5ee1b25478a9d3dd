#!/bin/bash
# r6a: BASELINE configs 2+3 at HEAD (VERDICT #5) + cpi256 config sweep
# toward <2 s (VERDICT #8).  Run alone (tunnel serialises; 1-CPU box —
# no concurrent CPU work during timing).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=/tmp/r6a.log
: > "$LOG"

run() {
  echo "=== $* ===" >> "$LOG"
  timeout 3000 stdbuf -oL -eL "$@" >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
}

# (a) config 3: dielectric multistatic at HEAD production defaults
#     (last measured 4.90e5 BEFORE lanes-last/compact/emit wins)
run python bench.py --scene dielectric --pulses 16 --repeat 3 --no-cpi256
# (b) config 2: moving multi-target CPI (never measured)
run python bench.py --scene moving --pulses 32 --repeat 3 --no-cpi256
# (c) cpi256 sweep at 31^3 (production default first = current 2.42-2.51)
run python bench.py --rays 31 --pulses 256 --repeat 2 --no-cpi256
run python bench.py --rays 31 --pulses 256 --repeat 2 --no-cpi256 --cluster-size 256 --mt-group 4
run python bench.py --rays 31 --pulses 256 --repeat 2 --no-cpi256 --ray-tile 256 --sub-tiles 4
run python bench.py --rays 31 --pulses 256 --repeat 2 --no-cpi256 --candidates 32 --mt-group 4
echo "R6A ALL DONE" >> "$LOG"
