#!/bin/bash
# Round-3 session P: bench A/B of the two r3o wins — the phase-1
# selection fusion barrier (_P1_SEL_MODE=2 default, −0.64 ms/pulse-seg
# in isolation) and compacted aggregation (agg_cap=4096, aggregate
# measured 2.57 ms/pulse in situ).  Baseline to beat: 4.507e6 rays/s /
# cpi256 2.664 s (r3n driver-default bench).  Then re-prove the 1e-6
# contract under the new codegen.
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== driver-default bench (barrier + agg compaction) ==="
timeout 6000 python -u bench.py 2>&1 | tail -3
echo R3P_BENCH_DONE; date

echo "=== attribution: agg compaction OFF (barrier only) ==="
timeout 6000 python -u bench.py --agg-cap 0 --no-cpi256 2>&1 | tail -2
echo R3P_AGG0_DONE; date

echo "=== on-hardware 1e-6 contract (new codegen) ==="
timeout 6000 bash scripts/verify_contract.sh 2>&1 | grep -vE "WARNING|Warning" | tail -12
echo R3P_DONE; date
