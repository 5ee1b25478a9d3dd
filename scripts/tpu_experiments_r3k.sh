#!/bin/bash
# Round-3 session K: (1) narrow sweep tail — n32 won at 4.40e6, try
# 24/48/64/96 (ceil(488/N) live-tile budgets 21/11/8/6 vs ~5 live tiles
# at seg 3); (2) kernel cost-model calibration — UNGATED (branch events
# vs VPU issue) and THIN_VALID (3 fewer full-width ops) at narrow32;
# (3) mt_group=16 re-test now that narrow killed late segments;
# (4) window-gather microbench (window-DMA feasibility); (5) honest
# per-segment marginals (profile_seg2b — profile_seg2's stages let XLA
# DCE different shading fractions per stage, attribution was noise).
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

B="timeout 6000 python -u bench.py --repeat 1 --pulses 32 --no-cpi256"
echo "=== narrow sweep: 24 / 48 / 64 / 96 ==="
for n in 24 48 64 96; do
  $B --compact-narrow $n 2>&1 | tail -2
done
echo R3K_NARROW_DONE; date

echo "=== kernel calibration at narrow32 (check received=2016) ==="
echo "--- UNGATED ---"
RTS_KERNEL_UNGATED=1 $B --compact-narrow 32 2>&1 | tail -2
echo "--- THIN_VALID ---"
RTS_KERNEL_THIN_VALID=1 $B --compact-narrow 32 2>&1 | tail -2
echo "--- UNGATED + THIN_VALID ---"
RTS_KERNEL_UNGATED=1 RTS_KERNEL_THIN_VALID=1 $B --compact-narrow 32 2>&1 | tail -2
echo "--- mt_group 16 ---"
$B --compact-narrow 32 --mt-group 16 2>&1 | tail -2
echo R3K_CALIB_DONE; date

echo "=== window-gather microbench ==="
timeout 3000 python -u scripts/microbench_wgather.py 2>&1 | grep -v Warning
echo "=== honest per-segment marginals ==="
timeout 9000 python -u scripts/profile_seg2b.py 2>&1 | grep -v Warning
echo R3K_DONE; date
