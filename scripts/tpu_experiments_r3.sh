#!/usr/bin/env bash
# Round-3 kernel experiments (run serially — ONE TPU process at a time).
#   a) post-restructure tuning: dma-depth-sensitive configs, cs/rt/cands
#   b) 63^3 chunked-grid fix: raised SMEM list budget vs chunking
# Each bench line prints rays/s; compiles are cached in /tmp/jax_cache.
set -x
cd "$(dirname "$0")/.."

# 63^3: current budget (chunked) vs raised budget (single pallas_call)
python bench.py --rays 63 --pulses 8 --no-cpi256 2>&1 | tail -2
RTS_SMEM_LIST_BUDGET=524288 python bench.py --rays 63 --pulses 8 --no-cpi256 2>&1 | tail -2

# 31^3 tuning after the epilogue split (balance may have shifted)
python bench.py --cluster-size 256 --no-cpi256 2>&1 | tail -2
python bench.py --candidates 16 --no-cpi256 2>&1 | tail -2
python bench.py --ray-tile 1024 --sub-tiles 16 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 256 --candidates 48 --no-cpi256 2>&1 | tail -2
