#!/bin/bash
# Round-3 session L: ship verification + body decomposition.
# 1) production bench with the new defaults (compact_narrow=-1 auto,
#    THIN_VALID on) at 63^3 and 31^3, plus cpi256 — headline numbers.
# 2) on-hardware 1e-6 contract re-proof (THIN_VALID changes kernel
#    codegen; the contract must be re-asserted, not assumed).
# 3) profile_shading3: DCE-proof in-situ body decomposition (gather /
#    scatters / miss / hit-floor) at 2 and 4 segments — explains the
#    ~20 ms/pulse static body cost of a DEAD full-width segment
#    (profile_seg2b r3k) and bounds what body thinning can win.
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== production bench (new defaults) 63^3 x3 + cpi256 ==="
timeout 9000 python -u bench.py --repeat 3 --pulses 32 2>&1 | tail -3
echo "=== production bench 31^3 (auto narrow on small fans) ==="
timeout 6000 python -u bench.py --repeat 2 --pulses 32 --rays 31 --no-cpi256 2>&1 | tail -2
echo R3L_BENCH_DONE; date

echo "=== on-hardware 1e-6 contract (THIN_VALID codegen) ==="
timeout 3000 python -u scripts/verify_contract.py 2>&1 | grep -v Warning | tail -8
timeout 3000 python -u scripts/verify_contract.py --refr 2>&1 | grep -v Warning | tail -8
echo R3L_CONTRACT_DONE; date

echo "=== body decomposition, 2 segments ==="
timeout 9000 python -u scripts/profile_shading3.py --segs 2 2>&1 | grep -v Warning
echo "=== body decomposition, 4 segments ==="
timeout 9000 python -u scripts/profile_shading3.py --segs 4 2>&1 | grep -v Warning
echo R3L_DONE; date
