#!/bin/bash
# Round-5 TPU runbook: the scaling dossier + warm-compile proof.
# Never run concurrently with CPU-heavy pytest (the AOT helper OOMs).
set -u
cd /root/repo
log=/tmp/tpu_runbook.log
: > "$log"
run() { echo "=== $* ===" >> "$log"; timeout 3600 env "$@" python bench.py >> "$log" 2>&1; echo "exit=$?" >> "$log"; }

# 1. Collective inventory of the 8-device hybrid-sharded executable
#    (virtual CPU mesh, no TPU time) -> BENCH_COMM_MS for the dossier.
echo "=== scaling_dossier (cpu mesh) ===" >> "$log"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
XLA_FLAGS=--xla_force_host_platform_device_count=8 \
timeout 3000 python scripts/scaling_dossier.py >> "$log" 2>&1
echo "exit=$?" >> "$log"
comm_ms=$(grep -o '"comm_ms_upper_bound": [0-9.]*' "$log" | tail -1 | awk '{print $2}')
comm_ms=${comm_ms:-1.4}

# 2. Measured scaling dossier on the real chip (writes SCALING.json).
#    Three step compiles (h-scales 1/0.5/0.25) — the big TPU spend.
run BENCH_MODE=scaling BENCH_STEPS=12 BENCH_COMM_MS="$comm_ms"

# 3. Warm-compile proof: the scaling run populated the persistent cache
#    for the full-scale step; these two record compile_seconds with a
#    warm cache (VERDICT r4 #2). Relay health proven by run 2.
run BENCH_MODE=step BENCH_STEPS=12 BENCH_DEVICE_TIMEOUT=0
run BENCH_MODE=step BENCH_STEPS=12 BENCH_DEVICE_TIMEOUT=0

# 4. Round artifact: step + loop + train + infer + folded projection.
run BENCH_MODE=all BENCH_BUDGET=2400 BENCH_DEVICE_TIMEOUT=0
echo DONE >> "$log"
