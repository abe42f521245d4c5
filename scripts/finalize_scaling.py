"""Fold the measured collective bound into SCALING.json.

`BENCH_MODE=scaling` runs on the real chip with whatever BENCH_COMM_MS
the caller had at the time; `scripts/scaling_dossier.py` (CPU mesh,
direct collective inventory of the production-shape 8-device sharded
HLO) can be refined afterwards without re-spending TPU time — the
projection is t(1/8) + comm, and only comm changes.
This script recomputes SCALING.json's projected value from the current
SCALING_COMM.json and records both comm bounds for the error budget.

Usage: python scripts/finalize_scaling.py
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main():
    scaling = json.loads((REPO / "SCALING.json").read_text())
    comm = json.loads((REPO / "SCALING_COMM.json").read_text())

    comm_ms = float(comm["comm_ms_upper_bound"])
    shard_ms = float(scaling["per_chip_shard_ms"])
    projected_ms = shard_ms + comm_ms
    projected = 1000.0 / projected_ms

    prior = {"comm_ms": scaling.get("comm_ms"),
             "value": scaling.get("value")}
    scaling.update({
        "value": round(projected, 3),
        "vs_baseline": round(projected / 25.0, 3),
        "comm_ms": round(comm_ms, 2),
        "comm_source": "scripts/scaling_dossier.py direct collective "
                       "inventory of the production-shape 8-device "
                       "sharded HLO (SCALING_COMM.json), serialized at "
                       "186 GB/s ICI",
        "comm_prior_uniform_bound": prior,
    })
    (REPO / "SCALING.json").write_text(json.dumps(scaling, indent=1))
    print(json.dumps({"projected_v5e8_steps_per_sec": scaling["value"],
                      "per_chip_shard_ms": shard_ms,
                      "comm_ms": comm_ms,
                      "was": prior}))


if __name__ == "__main__":
    main()
