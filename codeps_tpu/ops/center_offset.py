"""Device-side center-heatmap / offset ground-truth generation.

JAX equivalent of Dataset.get_offset_center (datasets/dataset.py:125-177;
numpy host version: codeps_tpu/data/dataset.py). The reference recomputes
these on CPU per mixup item inside the adapt forward
(datasets/mixup.py:242-257); this op keeps that work on the TPU when a
consumer actually needs it.

Fixed-capacity design: instance ids resolve through jnp.unique(size=K);
per-id statistics accumulate via exact int32 scatter-adds; the heatmap is
a chunked max over per-id truncated Gaussians (window radius 3*sigma+1,
matching the reference's kernel paste).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("sigma", "max_instances",
                                             "chunk"))
def compute_center_offset(instance_map: jnp.ndarray, sigma: int = 8,
                          max_instances: int = 128, chunk: int = 8):
    """(H, W) int instance map -> (offset (H, W, 2), center (H, W, 1)).

    Matches get_offset_center: id 0 is background; centers are per-id
    pixel-coordinate means; the heatmap takes the max of Gaussians pasted
    at *rounded* centers with Chebyshev radius 3*sigma+1.
    """
    height, width = instance_map.shape
    instance_map = instance_map.astype(jnp.int32)
    k = max_instances
    assert k % chunk == 0

    # Fill with int32-max so the padded tail stays sorted (fill_value=0
    # would break searchsorted whenever 0 is also a real id).
    sentinel = jnp.iinfo(jnp.int32).max
    ids = jnp.unique(instance_map, size=k, fill_value=sentinel)
    # per-pixel slot: index of the pixel's id in `ids`
    slot = jnp.searchsorted(ids, instance_map.reshape(-1)).astype(jnp.int32)

    y_coord, x_coord = jnp.mgrid[0:height, 0:width]
    y_flat = y_coord.reshape(-1).astype(jnp.int32)
    x_flat = x_coord.reshape(-1).astype(jnp.int32)

    ones = jnp.ones_like(slot)
    counts = jnp.zeros((k,), jnp.int32).at[slot].add(ones)
    sum_y = jnp.zeros((k,), jnp.int32).at[slot].add(y_flat)
    sum_x = jnp.zeros((k,), jnp.int32).at[slot].add(x_flat)

    valid = (ids != 0) & (counts > 0)
    safe_counts = jnp.maximum(counts, 1).astype(jnp.float32)
    center_y = sum_y.astype(jnp.float32) / safe_counts
    center_x = sum_x.astype(jnp.float32) / safe_counts

    # ---- offsets: center(instance(p)) - p, zero for background
    pix_valid = valid[slot]
    off_y = jnp.where(pix_valid, center_y[slot] - y_flat.astype(jnp.float32),
                      0.0)
    off_x = jnp.where(pix_valid, center_x[slot] - x_flat.astype(jnp.float32),
                      0.0)
    offset = jnp.stack([off_y.reshape(height, width),
                        off_x.reshape(height, width)], axis=-1)

    # ---- center heatmap: max over ids of truncated Gaussians at rounded
    # centers (reference pastes a precomputed kernel; identical values).
    radius = 3 * sigma + 1
    cy_round = jnp.round(center_y)
    cx_round = jnp.round(center_x)
    in_bounds = ((cx_round >= 0) & (cx_round < width)
                 & (cy_round >= 0) & (cy_round < height))
    active = valid & in_bounds

    yy = y_coord.astype(jnp.float32)
    xx = x_coord.astype(jnp.float32)

    def body(i, heat):
        sl = jax.lax.dynamic_slice_in_dim
        cy = sl(cy_round, i * chunk, chunk)
        cx = sl(cx_round, i * chunk, chunk)
        act = sl(active, i * chunk, chunk)
        dy = yy[None] - cy[:, None, None]
        dx = xx[None] - cx[:, None, None]
        gauss = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
        window = (jnp.abs(dx) <= radius) & (jnp.abs(dy) <= radius)
        contrib = jnp.where(window & act[:, None, None], gauss, 0.0)
        return jnp.maximum(heat, jnp.max(contrib, axis=0))

    heat = jax.lax.fori_loop(0, k // chunk, body,
                             jnp.zeros((height, width), jnp.float32))
    return offset, heat[..., None]
