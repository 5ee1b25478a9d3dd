#!/bin/bash
# Round-3 session N: (1) the driver's EXACT default bench invocation
# (P=128 + cpi256 — the r3l "production" numbers were --pulses 32),
# (2) phase-1 stage decomposition at the production config, (3) finer
# hit-body split (trig / smooth-normal / scatter attribution).
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== driver-default bench (python bench.py, P=128 + cpi256) ==="
timeout 6000 python -u bench.py 2>&1 | tail -3
echo R3N_BENCH_DONE; date

echo "=== phase-1 stage decomposition (production config) ==="
timeout 6000 python -u scripts/profile_phase1.py 2>&1 | grep -v Warning
echo R3N_P1_DONE; date

echo "=== hit-body split (trig / smooth / scatters) ==="
timeout 6000 python -u scripts/profile_hitsplit.py 2>&1 | grep -v Warning
echo R3N_DONE; date
