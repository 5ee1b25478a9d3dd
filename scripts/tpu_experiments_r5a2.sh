#!/bin/bash
# r5a2: shade-emit hardware A/B retry after the 32-row alignment fix.
set -x
cd /root/repo
exec 2>&1
echo "=== r5a2 shade_emit (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3 --shade-emit
echo "=== r5a2 shade_emit + mt_tail (P=16)"
timeout 3600 python bench.py --pulses 16 --repeat 3 --shade-emit --mt-tail
echo "=== r5a2 done"
