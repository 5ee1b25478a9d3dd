#!/bin/bash
# Round-3 session H (replaces r3g): decisive feature benches FIRST so a
# short tunnel window still settles the round-3 defaults, then the
# profiles and the r3f ray-tile sweep.  One TPU process at a time.
cd "$(dirname "$0")/.."
for i in $(seq 1 720); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); s = float((x @ x.T).sum())
print('TPU_UP', s)" 2>/dev/null | grep -q TPU_UP; then
    echo TUNNEL_OK
    break
  fi
  sleep 60
done
date

B="timeout 6000 python -u bench.py --repeat 1 --pulses 32"
echo "=== baseline (current defaults, P=32 for comparability) ==="
$B 2>&1 | tail -2
echo "=== compact-narrow 8 ==="
$B --compact-narrow 8 2>&1 | tail -2
echo "=== mt-tail ==="
$B --mt-tail 2>&1 | tail -2
echo "=== shade-gather window ==="
$B --shade-gather window 2>&1 | tail -2
echo "=== combo (narrow 8 + tail + window) ==="
$B --compact-narrow 8 --mt-tail --shade-gather window 2>&1 | tail -2
echo "=== narrow variants ==="
$B --compact-narrow 4 2>&1 | tail -2
$B --compact-narrow 16 2>&1 | tail -2
echo R3H_FEATURES_DONE
date

echo "=== STAGE shading2 (63^3 gather decomposition) ==="
timeout 4800 python -u scripts/profile_shading2.py 2>&1 | grep -v Warning
echo "=== STAGE shading seg split (post level-0) ==="
timeout 4800 python -u scripts/profile_shading.py 2>&1 | grep -v Warning
echo R3H_PROFILES_DONE
date

echo "=== STAGE r3f ray-tile sweep (cs=128 G=8) ==="
$B --ray-tile 256 --sub-tiles 4 2>&1 | tail -2
$B --ray-tile 1024 --sub-tiles 16 2>&1 | tail -2
$B --ray-tile 256 --sub-tiles 4 --candidates 32 2>&1 | tail -2
echo "=== STAGE production bench (full P=128 + cpi256, current defaults) ==="
timeout 7200 python -u bench.py --repeat 2 2>&1 | tail -2
echo R3H_DONE
date
