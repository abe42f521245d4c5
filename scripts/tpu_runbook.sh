#!/bin/bash
# Round-3 tail TPU runbook: fire once the axon relay is back.
# Never run concurrently with CPU-heavy pytest (the AOT helper OOMs).
set -u
cd /root/repo
log=/tmp/tpu_runbook.log
: > "$log"
run() { echo "=== $* ===" >> "$log"; timeout 1800 env "$@" python bench.py >> "$log" 2>&1; echo "exit=$?" >> "$log"; }

# 1. Primary re-confirm at HEAD (step + loop + train in one pass).
run BENCH_MODE=all

# 2. Remat A/B on the pretrain mode only.
run BENCH_MODE=train BENCH_TRAIN_REMAT=all
run BENCH_MODE=train BENCH_TRAIN_REMAT=none
run BENCH_MODE=train BENCH_TRAIN_REMAT=3,4
run BENCH_MODE=train BENCH_TRAIN_REMAT=1,2
echo DONE >> "$log"
