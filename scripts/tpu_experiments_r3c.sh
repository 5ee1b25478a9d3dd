#!/bin/bash
# Round-3 session C: candidate-order + cluster-size sweep on the real chip
# at the 63^3 production fan (model_reorder.py predicted the pair cuts;
# this measures what survives fixed costs).  One TPU process at a time.
set -x
cd "$(dirname "$0")/.."
R="--repeat 1 --pulses 128 --no-cpi256"
python bench.py $R 2>&1 | tail -1
python bench.py $R --cand-order mask 2>&1 | tail -1
python bench.py $R --cand-order mask --mt-group 2 2>&1 | tail -1
python bench.py $R --cluster-size 128 --candidates 32 2>&1 | tail -1
python bench.py $R --cluster-size 128 --candidates 32 --cand-order mask 2>&1 | tail -1
python bench.py $R --cluster-size 128 --candidates 32 --cand-order mask --mt-group 8 2>&1 | tail -1
python bench.py $R --cluster-size 64 --candidates 32 --cand-order mask --mt-group 8 2>&1 | tail -1
