#!/usr/bin/env python3
"""Measure host data-pipeline feed rate vs device consumption rate.

VERDICT r2 #8 / ROADMAP item: the pretrain host pipeline (PIL decode +
LANCZOS resize + center/offset GT; datasets/dataset.py:162-238 in the
reference) is the likely bottleneck for train_cityscapes.yaml at the
global batch of 48 (6/chip x 8). This script measures images/s FED by
``codeps_tpu.data.DataLoader`` over a full-resolution (1024x2048)
synthetic Cityscapes tree — the real decode+resize+GT cost — and
compares against the images/s CONSUMED by the TPU train step
(bench.py BENCH_MODE=train).

The container has ONE core, so the absolute fed number is the per-core
rate; worker processes parallelize sample assembly linearly until cores
run out (each sample is independent), so ``cores_needed`` =
consumed / per-core-rate is the honest sizing statement for a real
multi-core TPU host.

Usage:
  python scripts/measure_feed_rate.py [--frames N] [--batch 6]
      [--workers 0 2] [--consumed 11.99]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def measure(loader, min_batches: int, warmup: int) -> tuple[int, float]:
    """Steady-state images/s over min_batches within ONE epoch.

    The first ``warmup`` batches are excluded AND must exceed the
    loader's in-flight window (num_workers + prefetch): the window
    pre-computes batches during warmup, so counting fewer batches than
    the window measures pipelining, not throughput. The whole
    measurement must fit in one epoch — epoch boundaries re-fork the
    worker pool and refill the pipeline, which would be timed.
    """
    if len(loader) == 0:
        raise SystemExit(
            f"loader yields 0 batches (dataset smaller than batch size "
            f"{loader.batch_size} with drop_last) — raise --frames")
    if len(loader) < warmup + min_batches:
        raise SystemExit(
            f"one epoch is {len(loader)} batches but the measurement "
            f"needs warmup({warmup}) + timed({min_batches}) in a SINGLE "
            "epoch: crossing an epoch boundary re-forks the worker pool "
            "and refills the pipeline inside the timed window, "
            "understating the fed rate — raise --frames")
    images = 0
    start = None
    seen = 0
    for batch in loader:
        seen += 1
        if seen == warmup:
            start = time.perf_counter()
        elif seen > warmup:
            images += batch["frames"].shape[0]
        if seen >= warmup + min_batches:
            break
    return images, time.perf_counter() - start


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=None,
                        help="synthetic center frames (dataset length); "
                             "default: enough for warmup + timed batches "
                             "in one epoch")
    parser.add_argument("--batch", type=int, default=6,
                        help="per-host batch size (train_cityscapes: 6/chip"
                             ", 48 global on v5e-8)")
    parser.add_argument("--workers", type=int, nargs="+", default=[0, 2])
    parser.add_argument("--batches", type=int, default=10,
                        help="steady-state batches to time per setting")
    parser.add_argument("--consumed", type=float, default=None,
                        help="device images/s (bench.py pretrain number) "
                             "for the cores_needed estimate")
    parser.add_argument("--raw", type=str, default="1024x2048",
                        help="on-disk HxW (Cityscapes raw: 1024x2048)")
    parser.add_argument("--feed", type=str, default="512x1024")
    parser.add_argument("--sleep-sweep", type=int, nargs="*", default=None,
                        help="worker counts for the sleep-calibrated "
                             "scaling sweep (e.g. 1 2 4 8). Replaces the "
                             "per-sample CPU work with a sleep of the "
                             "measured single-worker latency, so the "
                             "LOADER's scaling (queueing, locks, collate, "
                             "prefetch) is measured without 1-core CPU "
                             "contention — samples are independent, so "
                             "real decode parallelizes the same way on a "
                             "multi-core host (VERDICT r4 #8).")
    args = parser.parse_args()
    raw_h, raw_w = (int(v) for v in args.raw.split("x"))
    feed_h, feed_w = (int(v) for v in args.feed.split("x"))
    if args.frames is None:
        # One epoch must cover warmup + timed batches for every worker
        # setting (epoch boundaries re-fork the pool mid-measurement).
        max_warmup = max(args.workers + (args.sleep_sweep or [])) \
            + 2 + 1  # prefetch default 2
        args.frames = args.batch * (max_warmup + args.batches + 1)

    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.data import Cityscapes, DataLoader
    from codeps_tpu.data.synthetic import make_cityscapes_tree

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        root = make_cityscapes_tree(Path(tmp) / "cs", num_frames=args.frames,
                                    width=raw_w, height=raw_h,
                                    content="smooth")
        build_s = time.perf_counter() - t0

        cfg = get_cfg_defaults().dataset
        cfg.name = "cityscapes"
        cfg.path = str(root)
        cfg.feed_img_size = [feed_h, feed_w]
        ds = Cityscapes("train", cfg, label_mode="codeps")

        results = {}
        for workers in args.workers:
            loader = DataLoader(ds, batch_size=args.batch, offsets=[1],
                                shuffle=True, seed=0, num_workers=workers,
                                num_threads=max(1, workers))
            warmup = workers + loader.prefetch + 1
            images, elapsed = measure(loader, args.batches, warmup)
            results[f"workers_{workers}"] = round(images / elapsed, 3)

        record = {
            "metric": "loader_images_per_sec",
            "raw": f"{raw_h}x{raw_w}", "feed": f"{feed_h}x{feed_w}",
            "batch": args.batch, "frames": args.frames,
            "tree_build_s": round(build_s, 1),
            "fed": results,
        }

        if args.sleep_sweep:
            # Calibrate the per-sample latency from the single-worker
            # measurement, then swap the dataset's __getitem__ for a
            # sleep of that length returning a prebuilt sample: worker
            # scaling is then limited only by the loader machinery
            # (sleeps overlap on one core exactly like independent
            # decode work overlaps on many cores).
            base = results.get("workers_0") or max(results.values())
            latency = 1.0 / base  # s per image at one worker

            sample0 = ds[0]

            class _SleepDataset:
                """ds stand-in: same attrs, sleep-calibrated samples."""

                def __init__(self, inner):
                    self._inner = inner

                def __getattr__(self, name):
                    return getattr(self._inner, name)

                def __len__(self):
                    return len(self._inner)

                def __getitem__(self, idx):
                    time.sleep(latency)
                    return sample0

            sleep_ds = _SleepDataset(ds)
            sweep = {}
            for workers in args.sleep_sweep:
                loader = DataLoader(sleep_ds, batch_size=args.batch,
                                    offsets=[1], shuffle=True, seed=0,
                                    num_workers=workers,
                                    num_threads=max(1, workers))
                warmup = workers + loader.prefetch + 1
                images, elapsed = measure(loader, args.batches, warmup)
                rate = images / elapsed
                sweep[f"workers_{workers}"] = {
                    "images_per_sec": round(rate, 3),
                    "scaling_efficiency": round(
                        rate / (base * max(workers, 1)), 3),
                }
            record["sleep_calibrated_sweep"] = {
                "per_sample_latency_s": round(latency, 4),
                "note": "per-sample work replaced by an equal sleep; "
                        "efficiency = rate / (workers x 1-worker rate). "
                        "Samples are independent, so real decode "
                        "parallelizes identically given cores.",
                **sweep,
            }
        if args.consumed:
            best = max(results.values())
            record["consumed_images_per_sec"] = args.consumed
            record["cores_needed_to_feed"] = round(args.consumed / best, 1)
        print(json.dumps(record))


if __name__ == "__main__":
    main()
