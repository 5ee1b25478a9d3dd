#!/bin/bash
# Round-3 session D: post-outage batch — measure the fused shade-gather +
# merge-drop shading changes, decompose shading (profile_shading2), the
# bounce-segment marginal (roadmap #2), and re-check cpi256's preferred
# hierarchy under level-0 phase 1 (roadmap #4).  One TPU process at a time.
set -x
cd "$(dirname "$0")/.."
# smoke first: correctness on the real chip before burning compile time
timeout 1200 python bench.py --tiny 2>&1 | tail -2
# on-hardware 1e-6 contract (engine merge change landed this session)
timeout 2400 bash scripts/verify_contract.sh 2>&1 | tail -4
# shading decomposition at the production config (incl. fused vs split gather)
timeout 2400 python scripts/profile_shading2.py 2>&1 | tail -12
# per-segment shading + seg2 marginal (bounce cost, roadmap #2)
timeout 2400 python scripts/profile_shading.py 2>&1 | tail -8
# seg1/seg2 kernel+phase1 + marginal-segment decomposition
timeout 2400 python scripts/profile_r3.py 2>&1 | tail -14
# headline bench, production default (cs=128 G=8) + cpi256 at the default
timeout 3600 python bench.py --repeat 2 2>&1 | tail -3
# cpi256 preference check: coarser hierarchy under level-0 phase 1
timeout 3600 python bench.py --repeat 1 --cluster-size 256 --mt-group 4 2>&1 | tail -3
echo R3D_DONE
