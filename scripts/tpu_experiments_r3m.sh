#!/bin/bash
# Round-3 session M: pin the per-grid-step fixed cost and re-sweep tile
# fatness under the new defaults (THIN_VALID + narrow auto).
# profile_seg2b r3k: a DEAD full-width segment costs ~20 ms/pulse, of
# which body ~9 (profile_shading3) — leaving ~11 ms of kernel+p1 on a
# dead input.  If profile_fixed confirms ~15-20 us/tile of grid-step
# fixed cost, halving grid steps (rt=1024) is worth ~7 ms/pulse.
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== fixed-cost split (p1/kernel x live/dead) ==="
timeout 6000 python -u scripts/profile_fixed.py 2>&1 | grep -v Warning
echo R3M_FIXED_DONE; date

B="timeout 6000 python -u bench.py --repeat 1 --pulses 32 --no-cpi256"
echo "=== ray-tile fatness sweep at production defaults ==="
echo "--- rt1024 st8 ---"
$B --ray-tile 1024 --sub-tiles 8 2>&1 | tail -2
echo "--- rt1024 st16 ---"
$B --ray-tile 1024 --sub-tiles 16 2>&1 | tail -2
echo "--- rt2048 st16 ---"
$B --ray-tile 2048 --sub-tiles 16 2>&1 | tail -2
echo "--- rt256 st4 (control: more, thinner tiles) ---"
$B --ray-tile 256 --sub-tiles 4 2>&1 | tail -2
echo R3M_SWEEP_DONE; date

echo "=== on-hardware 1e-6 contract (proper invocation) ==="
timeout 6000 bash scripts/verify_contract.sh 2>&1 | grep -vE "WARNING|Warning" | tail -12
echo R3M_DONE; date
