#!/bin/bash
# Round-3 session G: runs once the tunnel returns.  Order: profiles
# first (they steer the CPU-side work), then the r3f ray-tile sweep
# that never ran, then a fresh production bench.
# One TPU process at a time — run alone.
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

echo "=== STAGE shading2 (63^3 decomposition) ==="
timeout 4800 python -u scripts/profile_shading2.py 2>&1 | grep -v Warning
echo "=== STAGE shading seg2 (bounce-segment split, post level-0) ==="
timeout 4800 python -u scripts/profile_shading.py 2>&1 | grep -v Warning
echo "=== STAGE r3f ray-tile sweep (cs=128 G=8, P=32) ==="
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 256 --sub-tiles 4 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 256 --sub-tiles 8 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 1024 --sub-tiles 16 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 256 --sub-tiles 4 --candidates 32 2>&1 | tail -2
echo "=== STAGE production bench (current defaults) ==="
timeout 6000 python -u bench.py --repeat 2 2>&1 | tail -2
echo R3G_DONE
echo "=== STAGE shade-gather window bench (vs row default above) ==="
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --shade-gather window 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 2>&1 | tail -2
echo R3G_DONE2
echo "=== STAGE compact-narrow bench (late-segment tile narrowing) ==="
timeout 6000 python -u bench.py --repeat 1 --pulses 32 --compact-narrow 8 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --compact-narrow 16 2>&1 | tail -2
echo "=== STAGE combined narrow + window gather ==="
timeout 6000 python -u bench.py --repeat 1 --pulses 32 --compact-narrow 8 --shade-gather window 2>&1 | tail -2
echo R3G_DONE3
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --compact-narrow 4 2>&1 | tail -2
echo R3G_DONE4
echo "=== STAGE mt-tail bench ==="
timeout 6000 python -u bench.py --repeat 1 --pulses 32 --mt-tail 2>&1 | tail -2
echo "=== STAGE full combo (tail + narrow + window) ==="
timeout 6000 python -u bench.py --repeat 1 --pulses 32 --mt-tail --compact-narrow 8 --shade-gather window 2>&1 | tail -2
echo R3G_DONE5
