"""Device-side center/offset GT vs the host numpy implementation (which
is itself golden-tested against the reference in test_data.py)."""

import numpy as np
import jax.numpy as jnp

from codeps_tpu.data.dataset import get_offset_center
from codeps_tpu.ops.center_offset import compute_center_offset


def _compare(instance, sigma=4):
    ref_offset, ref_center = get_offset_center(instance, sigma=sigma)
    offset, center = compute_center_offset(jnp.asarray(instance),
                                           sigma=sigma, max_instances=32,
                                           chunk=8)
    np.testing.assert_allclose(np.asarray(center)[..., 0],
                               ref_center[..., 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(offset), ref_offset, atol=1e-3)


def test_center_offset_matches_host():
    instance = np.zeros((40, 56), np.int32)
    instance[5:15, 8:20] = 9001
    instance[20:32, 30:50] = 11002
    instance[35:39, 2:5] = 9003
    _compare(instance)


def test_center_offset_with_zero_id_and_overlapping_windows():
    instance = np.zeros((48, 48), np.int32)
    instance[2:10, 2:10] = 5
    instance[8:20, 6:18] = 7      # near the first: overlapping gaussians
    instance[30:34, 40:44] = 11005
    _compare(instance)


def test_center_offset_empty_map():
    instance = np.zeros((24, 32), np.int32)
    offset, center = compute_center_offset(jnp.asarray(instance), sigma=4,
                                           max_instances=32, chunk=8)
    assert float(jnp.abs(offset).max()) == 0.0
    assert float(center.max()) == 0.0


def test_center_offset_many_instances():
    rng = np.random.default_rng(3)
    instance = np.zeros((64, 96), np.int32)
    for i in range(20):
        y, x = rng.integers(0, 56), rng.integers(0, 88)
        instance[y:y + 6, x:x + 6] = 9000 + i
    _compare(instance, sigma=2)
