#!/bin/bash
# Round-3 session F: ray-tile sweep at the production config (cs=128
# G=8).  rt=512 was tuned in the cs=256 era; smaller tiles mean tighter
# per-tile candidate lists (fewer pairs/ray), bigger tiles amortise
# per-window fixed costs over more rays — unexplored axis at cs=128.
# Run AFTER r3e (one TPU process at a time).  P=32 keeps per-config
# cost down while amortising the dispatch floor.
set -x
cd "$(dirname "$0")/.."
for i in $(seq 1 240); do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256)); s = float((x @ x.T).sum())
print('TPU_UP', s)" 2>/dev/null | grep -q TPU_UP; then
    echo TUNNEL_OK
    break
  fi
  sleep 60
done
# sub-block row count stays 64 (rt/st): st scales with rt
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 256 --sub-tiles 4 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 256 --sub-tiles 8 2>&1 | tail -2
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 1024 --sub-tiles 16 2>&1 | tail -2
# tighter lists may allow a narrower candidate cap (SMEM headroom)
timeout 4800 python -u bench.py --repeat 1 --pulses 32 --ray-tile 256 --sub-tiles 4 --candidates 32 2>&1 | tail -2
echo R3F_DONE
