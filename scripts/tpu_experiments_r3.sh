#!/usr/bin/env bash
# Round-3 kernel experiments (run serially — ONE TPU process at a time).
# The candidate kernel is ~flop-bound (docs/PERF.md round-3 notes), so
# the sweep targets GATING GRANULARITY: smaller MT blocks (sub_tiles),
# smaller ray tiles (tighter tile frusta -> shorter candidate lists),
# finer clusters (more selective bits; pair-MT amortises their fixed
# cost).  Plus the 63^3 chunked-grid fix (raised SMEM list budget).
set -x
cd "$(dirname "$0")/.."

# finer MT-block gating at current tile/cluster sizes
python bench.py --sub-tiles 16 --no-cpi256 2>&1 | tail -2
python bench.py --sub-tiles 32 --no-cpi256 2>&1 | tail -2

# smaller ray tiles (tighter frusta): rt=256 at st=8 (32-row blocks)
python bench.py --ray-tile 256 --sub-tiles 8 --no-cpi256 2>&1 | tail -2
python bench.py --ray-tile 256 --sub-tiles 16 --no-cpi256 2>&1 | tail -2

# finer clusters with wider lists (pair-MT halves their step count)
python bench.py --cluster-size 256 --candidates 64 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 256 --candidates 64 --sub-tiles 16 --no-cpi256 2>&1 | tail -2

# 63^3: current budget (chunked) vs raised budget (single pallas_call)
python bench.py --rays 63 --pulses 8 --no-cpi256 2>&1 | tail -2
RTS_SMEM_LIST_BUDGET=524288 python bench.py --rays 63 --pulses 8 --no-cpi256 2>&1 | tail -2

# morton2 fan order re-test under pair-MT (r2: -10% from gated-row
# growth; pairing + union gates change the balance)
python bench.py --fan-order morton2 --no-cpi256 2>&1 | tail -2
python bench.py --fan-order morton2 --sub-tiles 16 --no-cpi256 2>&1 | tail -2

# coarser gating: fewer, bigger MT blocks (pair-MT already processes
# 2 candidates per step; block overhead may now dominate selectivity)
python bench.py --sub-tiles 4 --no-cpi256 2>&1 | tail -2

# continue down the cluster-size axis (pair-MT keeps the evaluation
# window at 2*cs columns; selectivity improves as cs shrinks)
python bench.py --cluster-size 128 --candidates 128 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 256 --candidates 48 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 128 --candidates 96 --no-cpi256 2>&1 | tail -2

# mt_group sweep: G candidates per MT window (G*cs-wide evaluation)
python bench.py --cluster-size 256 --candidates 64 --mt-group 4 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 128 --candidates 128 --mt-group 4 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 128 --candidates 128 --mt-group 8 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 512 --candidates 32 --mt-group 4 --no-cpi256 2>&1 | tail -2

# corners around the current best (cs=256 cand=64 G=4 = 1.97e6)
python bench.py --cluster-size 256 --candidates 64 --mt-group 8 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 256 --candidates 96 --mt-group 4 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 256 --candidates 64 --mt-group 4 --ray-tile 1024 --sub-tiles 16 --no-cpi256 2>&1 | tail -2
python bench.py --cluster-size 256 --candidates 64 --mt-group 4 --rays 63 --pulses 8 --no-cpi256 2>&1 | tail -2
