"""Spatial (H-axis) sharding of the online-adaptation step.

The reference caps adaptation at ONE GPU (an explicit assert,
/root/reference/scripts/adapt_codeps.py:391): its stream is inherently
sequential, so data parallelism cannot reduce per-frame latency — only
the side-batches (source replay / target replay / mixup) scale with
more devices. The TPU-native latency lever is sharding each frame's
conv/warp pipeline SPATIALLY over the ICI mesh: every image-like tensor
in the adapt batch is partitioned along its height axis and XLA's SPMD
partitioner inserts the conv halo exchanges and resize/warp collectives
(validated in scripts/spatial_shard_experiment.py — loss/grads match the
replicated run to f32 noise, ~1.4 ms/step collective payload at 384x1280
on a v5e-8 ring; see SPATIAL_SHARD.md).

This module productizes that layout: `shard_adapt_batch_spatial` places
a runner/bench adapt batch with H-sharded images (params and scalars
replicated), so the SAME jitted adapt step (tasks/adapt.py) runs either
replicated (1 chip) or spatially sharded (n chips) with no code change —
GSPMD derives the partitioning from the input shardings.

Enable via cfg.tpu.spatial_shard (scripts/adapt.py + AdaptationRunner).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Height-axis position per batch-leaf name. Everything not listed
# (cameras, intrinsics, cut_cells, do_ema, scalars) is replicated.
_H_AXIS_BY_KEY = {
    # (B, F, H, W, 3) frame triplets
    "frames": 2,
    # (N, H, W, 3) single images
    "rgb": 1,
    "rgb_src": 1,
    "rgb_tgt": 1,
    # (N, H, W) label / GT maps
    "semantic": 1,
    "semantic_eval": 1,
    "semantic_weights": 1,
    "semantic_src": 1,
    "thing_mask": 1,
    "depth_gt": 1,
    # (N, H, W, C) dense regression maps
    "center": 1,
    "offset": 1,
    "center_weights": 1,
    "offset_weights": 1,
    "center_ema": 1,
    "offset_ema": 1,
    # (N, H, W) c2c prewarp tap/weight planes (mixup_prep.c2c_prewarp)
    "ii": 1,
    "jj": 1,
    "wx": 1,
    "wy": 1,
    "in_x0": 1,
    "in_x1": 1,
    "in_y0": 1,
    "in_y1": 1,
    "sel_x0": 1,
    "sel_y0": 1,
    "nn_inside": 1,
}


def spatial_spec(key: str, ndim: int, axis: str) -> PartitionSpec:
    """PartitionSpec for one adapt-batch leaf: H-sharded if the leaf is
    an image-like tensor (by key name), replicated otherwise."""
    dim = _H_AXIS_BY_KEY.get(key)
    if dim is None or ndim <= dim:
        return PartitionSpec()
    spec = [None] * ndim
    spec[dim] = axis
    return PartitionSpec(*spec)


def _leaf_key(path) -> str:
    """Last dict key on a tree path ('' for non-dict leaves)."""
    for entry in reversed(path):
        if isinstance(entry, jax.tree_util.DictKey):
            return str(entry.key)
    return ""


def shard_adapt_batch_spatial(batch, mesh: Mesh, axis: str = "data"):
    """Place an adaptation batch with every image-like leaf sharded
    along its height axis over ``mesh[axis]`` (scalars/intrinsics
    replicated). Accepts the runner's batch pytree (nested domain dicts)
    or any flat image dict (eval batches)."""

    def place(path, leaf):
        if not hasattr(leaf, "ndim") and np.ndim(leaf) == 0:
            leaf = np.asarray(leaf)
        spec = spatial_spec(_leaf_key(path), np.ndim(leaf), axis)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, batch)


def shard_adapt_batch_hybrid(batch, mesh: Mesh, axis: str = "data"):
    """Hybrid dp+sp placement over ONE mesh axis: the batch-1 online
    target (and its eval GT) is H-sharded — the latency-critical
    per-frame pipeline — while the side-batches (source / target_replay
    / mixup), whose per-domain losses are batch means, shard over their
    batch dim when it is divisible by the mesh (the aggregate-throughput
    layout of __graft_entry__._dryrun_adapt). Falls back to H-sharding
    for non-divisible side batches."""
    ndev = mesh.shape[axis]
    placed = {}
    for key, sub in batch.items():
        if key in ("target", "eval_gt"):
            placed[key] = shard_adapt_batch_spatial(sub, mesh, axis)
        elif isinstance(sub, dict):
            first = next(iter(jax.tree.leaves(sub)), None)
            if first is not None and np.ndim(first) >= 1 and \
                    first.shape[0] % ndev == 0:
                sharding = NamedSharding(mesh, PartitionSpec(axis))
                placed[key] = jax.tree.map(
                    lambda x: jax.device_put(x, sharding), sub)
            else:
                placed[key] = shard_adapt_batch_spatial(sub, mesh, axis)
        else:
            placed[key] = jax.device_put(
                np.asarray(sub),
                NamedSharding(mesh, PartitionSpec()))
    return placed
