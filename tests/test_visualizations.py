"""Visualization panel tests (io_utils/visualizations.py parity surface).

Numpy-only — no device work."""

import numpy as np

from codeps_tpu.io.visualizations import (colorize_motion_map,
                                          gen_visualizations)

H, W = 16, 24


def test_motion_map_panel_shape_and_signs():
    """The sflow pair renders as [-m0 | m1] halves
    (io_utils/visualizations.py:309-342)."""
    rng = np.random.default_rng(0)
    m0 = rng.normal(0, 1, (H, W, 3)).astype(np.float32)
    m1 = rng.normal(0, 1, (H, W, 3)).astype(np.float32)
    panel = colorize_motion_map([m0, m1])
    assert panel.shape == (H, 2 * W, 3)
    assert panel.dtype == np.uint8
    # negation of the backward map: feeding [-m0, m1] flips the left half
    flipped = colorize_motion_map([-m0, m1])
    assert not np.array_equal(panel[:, :W], flipped[:, :W])
    np.testing.assert_array_equal(panel[:, W:], flipped[:, W:])


def test_gen_visualizations_includes_motion_panel():
    rng = np.random.default_rng(1)
    sample = {"frames": rng.uniform(0, 1, (1, 3, H, W, 3)).astype(
        np.float32)}
    results = {
        "depth": rng.uniform(1, 60, (1, H, W, 1)).astype(np.float32),
        "semantic": rng.integers(0, 14, (1, H, W)).astype(np.int32),
        "object_motion_map": [
            rng.normal(0, 1, (1, H, W, 3)).astype(np.float32),
            rng.normal(0, 1, (1, H, W, 3)).astype(np.float32)],
    }
    panels = gen_visualizations(sample, results, (0.0, 0.0, 0.0),
                                (1.0, 1.0, 1.0))
    assert "motion_0" in panels
    assert panels["motion_0"].shape == (H, 2 * W, 3)
    assert "rgb_0" in panels and "depth_0" in panels
