#!/bin/bash
# Round-3 session E: outage-resilient re-run of the r3d batch.
# Waits for the axon tunnel to come back, then runs each stage with
# unbuffered output (python -u) so partial results survive stage
# timeouts, ordered by value: smoke -> headline bench -> shading
# decomposition -> bounce marginal at the PRODUCTION config -> on-chip
# contract -> cpi256 hierarchy check.  One TPU process at a time.
set -x
cd "$(dirname "$0")/.."

# -- wait (up to ~6h) for the tunnel: a 8x128 matmul readback in <90s
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

# smoke: correctness on the real chip before burning compile time
timeout 2400 python -u bench.py --tiny 2>&1 | tail -3
# headline bench, production default (cs=128 G=8, 63^3, P=128):
# measures the fused shade-gather + merge-drop shading changes
timeout 4800 python -u bench.py --repeat 2 2>&1 | tail -3
# shading decomposition at the production config
timeout 3600 python -u scripts/profile_shading2.py 2>&1 | tail -12
# per-segment marginals at the PRODUCTION config (bounce cost, roadmap #2)
timeout 3600 python -u scripts/profile_r3.py --cluster-size 128 --mt-group 8 --rays 63 2>&1 | tail -16
# per-segment shading + seg2 marginal
timeout 3600 python -u scripts/profile_shading.py 2>&1 | tail -8
# on-hardware 1e-6 contract (engine merge change landed this session)
timeout 2400 bash scripts/verify_contract.sh 2>&1 | tail -4
# cpi256 preference check: coarser hierarchy under level-0 phase 1
timeout 3600 python -u bench.py --repeat 1 --cluster-size 256 --mt-group 4 2>&1 | tail -3
echo R3E_DONE
