#!/bin/bash
# Round-3 session J (post-restart; /tmp + jax cache wiped): re-run the
# r3i agenda — (1) bisect the combo received-count anomaly (gates
# shipping compact_narrow as default), (2) seg-2 decomposition
# (roadmap #2), (3) finish the compact_narrow sweep (12, 32), (4) a
# narrow8 production bench for the ledger.
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== STAGE bisect combo anomaly (per-pulse received, 3 repeats) ==="
timeout 9000 python -u scripts/bisect_combo.py 2>&1 | grep -v Warning
echo R3J_BISECT_DONE
date

echo "=== STAGE seg2 decomposition ==="
timeout 6000 python -u scripts/profile_seg2.py 2>&1 | grep -v Warning
echo R3J_SEG2_DONE
date

B="timeout 6000 python -u bench.py --repeat 1 --pulses 32 --no-cpi256"
echo "=== narrow sweep tail: 12 / 32 ==="
$B --compact-narrow 12 2>&1 | tail -2
$B --compact-narrow 32 2>&1 | tail -2
echo "=== narrow8 production bench (3 repeats) ==="
timeout 9000 python -u bench.py --repeat 3 --pulses 32 --no-cpi256 --compact-narrow 8 2>&1 | tail -2
echo R3J_DONE
date
