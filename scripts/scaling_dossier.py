"""Collective inventory of the FULL hybrid-sharded adaptation step.

VERDICT r4 #1 asked for a measured v5e-8 scaling dossier instead of an
assumed-perfect 1/n: this script supplies the COMMUNICATION half. It
compiles the production adapt step (multi-domain losses + fused mixup +
in-step teacher eval + EMA, tasks/adapt.py) over an 8-device mesh with
the hybrid sp+dp layout (parallel/spatial.py, same placement as
__graft_entry__.build_adapt_program / the driver's dryrun), walks the
optimized HLO for collective ops, scales the moved bytes from the probe
shape to the production adaptation shapes (384x1280 target, 512x1024
source — scripts/adapt_codeps.py feed sizes), and prints the serialized
ICI cost at v5e ring bandwidth.

The COMPUTE half comes from real-chip measurements:
`BENCH_MODE=scaling python bench.py` times the production step at
height scales 1, 1/2, 1/4 (the per-chip workload of the H-sharded
layout at n = 1, 2, 4 chips minus collectives), fits t(s) = a*s + b and
projects t(1/8) + comm_ms. Pass this script's output via
BENCH_COMM_MS. Results land in SCALING.json / SCALING.md.

Runs on the virtual CPU mesh (zero TPU time):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/scaling_dossier.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))
if str(REPO / "scripts") not in sys.path:
    sys.path.insert(0, str(REPO / "scripts"))

# Production adaptation feed sizes (cfg/adapt_cityscapes_semkittidvps.yaml
# target 384x1280; source Cityscapes 512x1024) and bench side counts.
PROD_HT, PROD_WT = 384, 1280
PROD_HS, PROD_WS = 512, 1024
V5E_ICI_GBPS = 186e9  # one v5e ring direction, B/s


def main():
    import numpy as np

    from __graft_entry__ import _force_cpu_mesh, build_adapt_program
    from spatial_shard_experiment import collective_inventory

    n_devices = 8
    devices = _force_cpu_mesh(n_devices)
    from jax.sharding import Mesh
    mesh = Mesh(np.asarray(devices), ("data",))

    # Compile at the EXACT production shapes and read the collective
    # bytes straight from the optimized HLO — no extrapolation. (Tiny
    # probes are NOT representative: at 32x64/8 devices each chip holds
    # 4 rows, and GSPMD picks different partitioning strategies than at
    # the production 48-64 rows/chip — measured exponent fits went
    # superlinear on strategy changes, not physics. XLA compile time is
    # op-count-bound, not shape-bound, so the full-shape compile costs
    # about the same as the probe did.) A half-production compile
    # sanity-checks that the production reading sits on a stable curve.
    shapes = {
        "half": (PROD_HT // 2, PROD_WT // 2, PROD_HS // 2, PROD_WS // 2),
        "prod": (PROD_HT, PROD_WT, PROD_HS, PROD_WS),
    }
    readings = {}
    for name, (ht, wt, hs, ws) in shapes.items():
        step, state, batch = build_adapt_program(mesh, n_devices,
                                                 ht=ht, wt=wt,
                                                 hs=hs, ws=ws)
        print(f"lowering+compiling full adapt step on {n_devices}-dev "
              f"mesh ({name}: {ht}x{wt} / {hs}x{ws})...", flush=True)
        compiled = step.lower(state, batch).compile()
        counts, byte_totals = collective_inventory(compiled.as_text())
        readings[name] = (dict(counts), dict(byte_totals))
        del step, state, batch, compiled

    prod_counts, prod_bytes = readings["prod"]
    _, half_bytes = readings["half"]
    total_bytes = sum(prod_bytes.values())
    comm_ms = total_bytes / V5E_ICI_GBPS * 1e3

    collectives = {}
    for op in sorted(prod_bytes):
        b_half = half_bytes.get(op, 0)
        collectives[op] = {
            "count": prod_counts.get(op, 0),
            "bytes_half": b_half,
            "bytes_prod": prod_bytes[op],
            "growth_half_to_prod": (round(prod_bytes[op] / b_half, 2)
                                    if b_half else None),
        }

    record = {
        "shapes": {k: list(v) for k, v in shapes.items()},
        "devices": n_devices,
        "layout": "hybrid sp+dp (parallel/spatial.py)",
        "collectives": collectives,
        "total_bytes_prod": total_bytes,
        "ici_gbps": V5E_ICI_GBPS / 1e9,
        "comm_ms_upper_bound": round(comm_ms, 2),
        "note": "serialized upper bound (zero compute overlap) read "
                "DIRECTLY from the production-shape 8-device sharded "
                "HLO; bytes_half shows the same reading at half shapes "
                "(growth ~4x pixel-proportional, ~2x halo classes)",
    }
    out = REPO / "SCALING_COMM.json"
    out.write_text(json.dumps(record, indent=1))
    print(json.dumps(record, indent=1))
    print(f"wrote {out}; pass BENCH_COMM_MS={record['comm_ms_upper_bound']}"
          " to BENCH_MODE=scaling", flush=True)


if __name__ == "__main__":
    main()
