#!/bin/bash
# Round-3 tail TPU runbook: fire once the axon relay is back.
# Never run concurrently with CPU-heavy pytest (the AOT helper OOMs).
set -u
cd /root/repo
log=/tmp/tpu_runbook.log
: > "$log"
# Outer timeout must exceed bench.py's internal BENCH_BUDGET so the
# graceful budget-skip path engages instead of a mid-extras SIGTERM.
run() { echo "=== $* ===" >> "$log"; timeout 3000 env "$@" python bench.py >> "$log" 2>&1; echo "exit=$?" >> "$log"; }

# 1. Primary re-confirm at HEAD (step + loop + train + infer in one pass).
run BENCH_MODE=all BENCH_BUDGET=2100

# 2. Remat A/B on the pretrain mode only. Relay health was proven by
# run 1, so skip the guard's duplicate backend-init probe.
run BENCH_MODE=train BENCH_TRAIN_REMAT=all BENCH_DEVICE_TIMEOUT=0
run BENCH_MODE=train BENCH_TRAIN_REMAT=none BENCH_DEVICE_TIMEOUT=0
run BENCH_MODE=train BENCH_TRAIN_REMAT=3,4 BENCH_DEVICE_TIMEOUT=0
run BENCH_MODE=train BENCH_TRAIN_REMAT=1,2 BENCH_DEVICE_TIMEOUT=0
echo DONE >> "$log"
