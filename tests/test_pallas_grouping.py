"""Pallas grouping kernel vs the lax reference path (interpret mode on
the CPU test mesh; the compiled kernel runs on real TPU via bench/eval)."""

import numpy as np

import jax.numpy as jnp

from codeps_tpu.ops.panoptic import Centers, find_instance_centers, \
    group_pixels
from codeps_tpu.ops.pallas.grouping import group_pixels_pallas

RNG = np.random.default_rng(17)


def _centers(k=8, height=32, width=128, valid_count=5):
    yx = RNG.uniform([0, 0], [height, width], (k, 2)).astype(np.float32)
    valid = np.zeros((k,), bool)
    valid[:valid_count] = True
    return Centers(yx=jnp.asarray(yx), score=jnp.ones((k,)),
                   valid=jnp.asarray(valid))


def test_pallas_grouping_matches_lax():
    height, width = 32, 128
    centers = _centers()
    offsets = jnp.asarray(
        RNG.normal(0, 5, (height, width, 2)).astype(np.float32))

    ref = group_pixels(centers, offsets)
    ours = group_pixels_pallas(centers.yx, centers.valid, offsets,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_pallas_grouping_no_valid_centers():
    height, width = 16, 128
    centers = _centers(valid_count=0)
    offsets = jnp.zeros((height, width, 2), jnp.float32)
    out = group_pixels_pallas(centers.yx, centers.valid, offsets,
                              interpret=True)
    assert int(np.asarray(out).max()) == 0


def test_pallas_grouping_from_real_heatmap():
    """End-to-end: NMS centers -> pallas grouping == lax grouping."""
    height, width = 32, 128
    heatmap = np.zeros((height, width), np.float32)
    for y, x in ((5, 20), (18, 90), (28, 40)):
        yy, xx = np.mgrid[0:height, 0:width]
        heatmap = np.maximum(
            heatmap, np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 50.0))
    centers = find_instance_centers(jnp.asarray(heatmap), top_k=8)
    offsets = jnp.asarray(
        RNG.normal(0, 2, (height, width, 2)).astype(np.float32))

    ref = group_pixels(centers, offsets)
    ours = group_pixels_pallas(centers.yx, centers.valid, offsets,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
