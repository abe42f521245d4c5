"""Pallas TPU kernel: nearest-offset-center pixel grouping.

The instance-grouping hot op of panoptic fusion
(reference: misc/post_processing_panoptic.py:73-109; lax fallback:
codeps_tpu/ops/panoptic.py:group_pixels). For every pixel p the kernel
computes ``argmin_k ||(p + offset(p)) - center_k||`` over K NMS centers
and emits the 1-based center id.

Kernel design: the image is tiled over rows; each program holds a
(TILE_H, W) offset block in VMEM plus the full (2, K) center table
(K <= 256 -> 2 KB, in SMEM for dynamic scalar reads) and keeps running (min-distance, argmin) accumulators
in registers/VMEM while unrolling the center axis in chunks of 8 lanes of
broadcast work — the K x H*W distance matrix never exists in any memory
space. One pass over HBM: read 2 offset planes, write 1 id plane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
CENTER_CHUNK = 8


def _grouping_kernel(centers_ref, off_y_ref, off_x_ref, out_ref, *,
                     num_centers: int, tile_h: int):
    row0 = pl.program_id(0) * tile_h
    shape = off_y_ref.shape  # (TILE_H, W)

    # Mosaic requires integer iota; convert after.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(
        jnp.float32) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(
        jnp.float32)
    loc_y = row_ids + off_y_ref[:]
    loc_x = col_ids + off_x_ref[:]

    best_dist = jnp.full(shape, jnp.inf, jnp.float32)
    best_id = jnp.zeros(shape, jnp.int32)

    def body(chunk_index, carry):
        best_dist, best_id = carry
        base = chunk_index * CENTER_CHUNK
        for j in range(CENTER_CHUNK):
            cy = centers_ref[0, base + j]
            cx = centers_ref[1, base + j]
            dy = loc_y - cy
            dx = loc_x - cx
            dist = dy * dy + dx * dx
            take = dist < best_dist
            best_dist = jnp.where(take, dist, best_dist)
            best_id = jnp.where(take, base + j, best_id)
        return best_dist, best_id

    best_dist, best_id = jax.lax.fori_loop(
        0, num_centers // CENTER_CHUNK, body, (best_dist, best_id))
    out_ref[:] = best_id + 1


def group_pixels_pallas(centers_yx: jnp.ndarray, centers_valid: jnp.ndarray,
                        offsets: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """(H, W) int32 instance ids in 1..K from offsets + centers.

    Args:
      centers_yx: (K, 2) float32 (y, x); invalid rows may hold garbage.
      centers_valid: (K,) bool.
      offsets: (H, W, 2) with channels (dy, dx).

    Requires W % 128 == 0 and H % TILE_H == 0 (all published feed sizes
    qualify); callers fall back to the lax path otherwise.
    """
    height, width, _ = offsets.shape
    k = centers_yx.shape[0]
    assert k % CENTER_CHUNK == 0
    assert width % 128 == 0 and height % TILE_H == 0

    # invalid centers can never win the argmin
    cy = jnp.where(centers_valid, centers_yx[:, 0], jnp.inf)
    cx = jnp.where(centers_valid, centers_yx[:, 1], jnp.inf)
    centers = jnp.stack([cy, cx]).astype(jnp.float32)  # (2, K)

    kernel = functools.partial(_grouping_kernel, num_centers=k,
                               tile_h=TILE_H)
    grid = (height // TILE_H,)
    instance = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # scalar table: dynamic per-center reads live in SMEM
            pl.BlockSpec((2, k), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_H, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_H, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        interpret=interpret,
    )(centers, offsets[..., 0], offsets[..., 1])

    # No centers at all -> all-zero map (reference:147-149).
    return jnp.where(jnp.any(centers_valid), instance, 0)
