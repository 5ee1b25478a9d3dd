#!/bin/bash
# Round-3 session Q: honest decompositions at the PINNED production
# hierarchy (the r3n runs used the 16/16 module default, c973df1), plus
# the kernel dead-floor bisect (_KERNEL_FLOOR masks).
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== kernel dead-floor bisect (_KERNEL_FLOOR) ==="
timeout 6000 python -u scripts/profile_kfloor.py 2>&1 | grep -v Warning
echo R3Q_KFLOOR_DONE; date

echo "=== hit-body split (trig / smooth / scatters), pinned hierarchy ==="
timeout 6000 python -u scripts/profile_hitsplit.py 2>&1 | grep -v Warning
echo R3Q_HITSPLIT_DONE; date

echo "=== phase-1 stage decomposition (post-barrier, pinned) ==="
timeout 6000 python -u scripts/profile_phase1.py 2>&1 | grep -v Warning
echo R3Q_DONE; date
