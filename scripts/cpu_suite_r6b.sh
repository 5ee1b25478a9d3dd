#!/bin/bash
# r6b: suite-abort verification (VERDICT #6).  The conftest now re-execs
# pytest without PALLAS_AXON_POOL_IPS so the axon PJRT .so never loads
# into the CPU test process (the accumulated-state SIGSEGV suspect).
# Three consecutive full-suite runs of the DOCUMENTED invocation must
# complete.  CPU-only — but run it with NO concurrent TPU timing job
# (1-CPU box).
set -u
cd /root/repo
LOG=/tmp/r6b.log
: > "$LOG"
for i in 1 2 3; do
  echo "=== full suite run $i ===" >> "$LOG"
  PYTHONFAULTHANDLER=1 timeout 2700 python -m pytest tests/ -q >> "$LOG" 2>&1
  echo "--- exit=$? ---" >> "$LOG"
done
echo "R6B ALL DONE" >> "$LOG"
