#!/bin/bash
# r5a3: gated shade-emit extraction (any(better) sync) A/B.
set -x
cd /root/repo
exec 2>&1
echo "=== r5a3 shade_emit GATED (P=16)"
RTS_SHADE_EMIT_GATED=1 timeout 3600 python bench.py --pulses 16 --repeat 3 --shade-emit
echo "=== r5a3 shade_emit GATED + mt_tail (P=16)"
RTS_SHADE_EMIT_GATED=1 timeout 3600 python bench.py --pulses 16 --repeat 3 --shade-emit --mt-tail
echo "=== r5a3 done"
