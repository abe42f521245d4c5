#!/usr/bin/env python
"""Aggregate a jax.profiler trace into per-op-bucket device time.

Usage: python scripts/mine_trace.py <profile_dir> [top_n]

Reads the newest .trace.json.gz under <profile_dir> (the directory
passed as BENCH_PROFILE to bench.py), sums event durations on the TPU
device tracks, and prints the top buckets by total time — grouped by
the fusion/op name prefix so the output matches the ms/step budgets in
docs/ROADMAP.md. Divide by the number of profiled steps by eye (the
step count is whatever the bench's timed windows ran, typically
3 + (3 + BENCH_STEPS)).
"""

from __future__ import annotations

import collections
import gzip
import json
import pathlib
import re
import sys


def _bucket(name: str) -> str:
    """Collapse an XLA op/fusion name into a coarse bucket."""
    n = name.lower()
    if "gather" in n:
        return "gather"
    if "scatter" in n or "select-and-scatter" in n:
        return "scatter"
    if "convolution" in n or "conv" in n and "fusion" not in n:
        return "convolution"
    if "reduce-window" in n:
        return "reduce-window"
    if "all-reduce" in n or "all-gather" in n or "collective" in n:
        return "collective"
    if "sort" in n:
        return "sort"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout/copy"
    if "fusion" in n:
        return "fusion(elementwise/loop)"
    if "dynamic" in n:
        return "dynamic-slice/update"
    return "other"


def main() -> int:
    root = pathlib.Path(sys.argv[1])
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    traces = sorted(root.rglob("*.trace.json.gz"),
                    key=lambda p: p.stat().st_mtime)
    if not traces:
        print(f"no .trace.json.gz under {root}", file=sys.stderr)
        return 1
    path = traces[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)

    events = data.get("traceEvents", [])
    # device tracks: pid whose process_name metadata mentions TPU/device
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if re.search(r"tpu|device|/device:", pname, re.I):
                dev_pids.add(ev["pid"])

    by_bucket = collections.Counter()
    by_name = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur_ms = ev["dur"] / 1e3
        by_bucket[_bucket(name)] += dur_ms
        by_name[name] += dur_ms

    total = sum(by_bucket.values())
    print(f"total device event time: {total:.1f} ms")
    print("\n== buckets ==")
    for b, ms in by_bucket.most_common():
        print(f"{ms:10.1f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {b}")
    print(f"\n== top {top_n} ops ==")
    for name, ms in by_name.most_common(top_n):
        print(f"{ms:10.1f} ms  {name[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
