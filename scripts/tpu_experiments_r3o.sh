#!/bin/bash
# Round-3 session O: (1) in-situ marginals of replay/postprocess/
# aggregate at the production config (the ~10 ms/pulse outside
# trace_fan that no profiler has measured), (2) phase-1 final-selection
# variants (int-key top_k, fusion-barrier partials) for the anomalous
# 1.68 ms/pulse-segment selection stage.
cd "$(dirname "$0")/.."
mkdir -p /tmp/jax_cache
date

echo "=== post-trace marginals (replay / postprocess / aggregate) ==="
timeout 6000 python -u scripts/profile_post.py 2>&1 | grep -v Warning
echo R3O_POST_DONE; date

echo "=== phase-1 selection variants ==="
timeout 6000 python -u scripts/profile_p1sel.py 2>&1 | grep -v Warning
echo R3O_DONE; date
