"""Batch assembly + a threaded prefetching loader.

Replaces torch DataLoader + collate_batch (misc/train_utils.py:81-190)
with a host-side pipeline: worker threads run __getitem__ (numpy/PIL
release the GIL for the heavy ops), samples collate into the canonical
NHWC batch dict consumed by the jitted steps, and a prefetch queue keeps
the device fed (double buffering happens naturally via dispatch-ahead).
"""

from __future__ import annotations

import multiprocessing
import os
import queue
import random
import threading
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np


def collate_batch(samples: List[Dict[str, Any]],
                  offsets: Sequence[int] = (1,)) -> Dict[str, np.ndarray]:
    """List of dataset samples -> canonical batch dict.

    Output keys (all NHWC, frame axis = [t, t-1, t+1, ...]):
      frames (B, 1+2*len(offsets), H, W, 3), camera (B, 4),
      semantic/semantic_weights/thing_mask (B, H, W),
      center/center_weights (B, H, W, 1), offset/offset_weights (B, H, W, 2|1),
      depth_gt (B, H, W) when present, instance (B, H, W) when present.
    """
    first = samples[0]
    batch: Dict[str, Any] = {}

    frame_offsets = [0]
    for offset in offsets:
        frame_offsets += [-offset, offset]
    frames = np.stack([
        np.stack([sample["rgb"][o] for o in frame_offsets])
        for sample in samples
    ])
    # uint8 frames pass through raw (on-device normalization path)
    batch["frames"] = frames if frames.dtype == np.uint8 \
        else frames.astype(np.float32)
    batch["camera"] = np.stack(
        [np.asarray(sample["camera_model"], np.float32)
         for sample in samples])

    def stack(key, dtype):
        if key in first:
            batch[key] = np.stack(
                [np.asarray(sample[key]) for sample in samples]).astype(dtype)

    stack("semantic", np.int32)
    stack("semantic_eval", np.int32)
    stack("semantic_weights", np.float32)
    stack("center", np.float32)
    stack("center_weights", np.float32)
    stack("offset", np.float32)
    stack("offset_weights", np.float32)
    stack("thing_mask", np.int32)
    stack("instance", np.int32)
    if "depth" in first:
        batch["depth_gt"] = np.stack(
            [np.asarray(sample["depth"]) for sample in samples]).astype(
                np.float32)
    return batch


# ---- multi-process workers (fork): the reference's
# DataLoader(num_workers=N) + worker_init_fn equivalent
# (misc/train_utils.py:117-190, datasets/replay_buffer.py:311-318).
# RNGs are seeded PER BATCH TASK (not per worker), so augmentation draws
# are deterministic regardless of which worker picks up which batch.
# Workers never touch jax (dataset code is numpy/PIL/cv2 only), so the
# fork-under-JAX-threads warning is benign here; glibc resets allocator
# locks via pthread_atfork.
_WORKER_STATE: Dict[str, Any] = {}


def _mp_worker_init(dataset, offsets) -> None:
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["offsets"] = offsets


def _mp_fetch_batch(task) -> Dict[str, np.ndarray]:
    batch_indices, seed = task
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    dataset = _WORKER_STATE["dataset"]
    samples = [dataset[int(i)] for i in batch_indices]
    return collate_batch(samples, _WORKER_STATE["offsets"])


class DataLoader:
    """Minimal shuffling, prefetching loader over a Dataset.

    ``num_workers > 0`` assembles batches in forked worker processes
    (PIL decode + LANCZOS + center/offset GT are the pretrain host
    bottleneck and hold the GIL in numpy loops); ``num_workers == 0``
    uses the in-process prefetch thread.
    """

    def __init__(self, dataset, batch_size: int, offsets: Sequence[int],
                 shuffle: bool = True, seed: int = 0, drop_last: bool = True,
                 num_threads: int = 4, prefetch: int = 2,
                 shard_index: int = 0, num_shards: int = 1,
                 num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.offsets = list(offsets)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.num_workers = num_workers
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _indices(self) -> np.ndarray:
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        # Per-host sharding (multi-process data parallel). Pad to a
        # common shard length by wrapping (torch DistributedSampler
        # semantics, which the reference's loaders inherit): unequal
        # per-host batch counts would leave one host running an extra
        # step whose cross-process collectives never complete — a
        # permanent end-of-epoch deadlock.
        if self.num_shards > 1 and len(indices) > 0:
            total = -(-len(indices) // self.num_shards) * self.num_shards
            indices = np.resize(indices, total)
            return indices[self.shard_index::self.num_shards]
        return indices

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        n_batches = len(self)
        batches = [indices[i * self.batch_size:(i + 1) * self.batch_size]
                   for i in range(n_batches)]
        if self.num_workers > 0:
            yield from self._iter_processes(batches)
            return

        out_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def _put(item) -> bool:
            # Bounded put that re-checks stop: a consumer that breaks
            # early (max_batches caps, benches) sets stop from its
            # finally, and a producer parked in a blocking put() on the
            # full queue would otherwise leak the thread + its buffered
            # batches forever.
            while not stop.is_set():
                try:
                    out_queue.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for batch_indices in batches:
                    if stop.is_set():
                        return
                    samples = [self.dataset[int(i)] for i in batch_indices]
                    if not _put(collate_batch(samples, self.offsets)):
                        return
                _put(None)
            except BaseException as exc:  # surface worker errors
                _put(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = out_queue.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _iter_processes(self, batches) -> Iterator[Dict[str, np.ndarray]]:
        ctx = multiprocessing.get_context("fork")
        pool = ctx.Pool(self.num_workers, initializer=_mp_worker_init,
                        initargs=(self.dataset, self.offsets))

        def task_seed(i: int) -> int:
            # collision-resistant mixing over (run seed, epoch, host
            # shard, batch index): large datasets and multi-host runs
            # must not repeat or correlate augmentation streams
            seq = np.random.SeedSequence(
                [self.seed, self.epoch, self.shard_index, i])
            return int(seq.generate_state(1)[0])

        # Bounded in-flight window (the threaded path's
        # queue.Queue(maxsize=prefetch) backpressure equivalent):
        # submitting the whole epoch to imap would buffer every finished
        # batch in the parent when the consumer stalls (compiles, slow
        # steps) and OOM the host.
        window = self.num_workers + self.prefetch
        inflight = []
        try:
            for i, batch in enumerate(batches[:window]):
                inflight.append(pool.apply_async(
                    _mp_fetch_batch, ((batch, task_seed(i)),)))
            # Pool silently repopulates dead workers but never completes
            # the killed worker's task, so an untimed get() hangs
            # forever on e.g. an OOM-killed decode. Bound it and fail
            # loudly instead.
            task_timeout = float(os.environ.get(
                "CODEPS_LOADER_TASK_TIMEOUT", "600"))
            for i in range(len(batches)):
                try:
                    result = inflight.pop(0).get(timeout=task_timeout)
                except multiprocessing.TimeoutError:
                    raise RuntimeError(
                        f"loader worker batch timed out after "
                        f"{task_timeout:.0f}s — a forked worker likely "
                        "died (OOM-killed?); raise "
                        "CODEPS_LOADER_TASK_TIMEOUT if batches are "
                        "legitimately slower") from None
                nxt = i + window
                if nxt < len(batches):
                    inflight.append(pool.apply_async(
                        _mp_fetch_batch, ((batches[nxt], task_seed(nxt)),)))
                yield result
        finally:
            pool.terminate()
            pool.join()
