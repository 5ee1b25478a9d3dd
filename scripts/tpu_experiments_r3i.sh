#!/bin/bash
# Round-3 session I: wait for the r3h batch (one TPU process at a time),
# then (1) bisect the combo received-count anomaly, (2) finish the
# compact_narrow sweep (32, 12), (3) production bench at the winning
# narrow default for the PERF ledger.
cd "$(dirname "$0")/.."
while kill -0 "$(cat /tmp/r3h.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
echo R3H_EXITED
# tunnel sanity loop (it may be down after a long batch)
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

echo "=== STAGE bisect combo anomaly (per-pulse received, 3 repeats) ==="
timeout 9000 python -u scripts/bisect_combo.py 2>&1 | grep -v Warning
echo R3I_BISECT_DONE
date

B="timeout 6000 python -u bench.py --repeat 1 --pulses 32 --no-cpi256"
echo "=== narrow sweep tail: 12 / 32 ==="
$B --compact-narrow 12 2>&1 | tail -2
$B --compact-narrow 32 2>&1 | tail -2
echo R3I_DONE
date
