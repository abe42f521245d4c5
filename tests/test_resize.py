"""Parity tests: resize ops vs torch F.interpolate semantics."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

import jax.numpy as jnp

from codeps_tpu.ops import (resize_bilinear, resize_nearest,
                            upsample_bilinear_2x_align, upsample_nearest_2x)

RNG = np.random.default_rng(1)


def _nchw(x):
    return np.asarray(x).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("shape,out", [
    ((2, 16, 24, 3), (8, 12)),    # /2 downscale (photometric pyramid)
    ((1, 16, 24, 1), (4, 6)),     # /4
    ((1, 15, 21, 2), (7, 10)),    # odd sizes (floor-div pyramid)
    ((1, 8, 12, 3), (16, 24)),    # upscale
    ((1, 9, 13, 3), (5, 7)),      # odd→odd
])
def test_resize_bilinear_matches_torch(shape, out):
    img = RNG.uniform(0, 1, shape).astype(np.float32)
    ref = F.interpolate(torch.tensor(img.transpose(0, 3, 1, 2)), out,
                        mode="bilinear", align_corners=False).numpy()
    ours = resize_bilinear(jnp.asarray(img), out)
    np.testing.assert_allclose(_nchw(ours), ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("out", [(8, 12), (4, 6), (16, 24), (5, 9)])
def test_resize_nearest_matches_torch(out):
    img = RNG.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
    ref = F.interpolate(torch.tensor(img.transpose(0, 3, 1, 2)), out,
                        mode="nearest").numpy()
    ours = resize_nearest(jnp.asarray(img), out)
    np.testing.assert_allclose(_nchw(ours), ref)


def test_upsample_nearest_2x_matches_torch():
    img = RNG.uniform(0, 1, (2, 7, 9, 4)).astype(np.float32)
    ref = F.interpolate(torch.tensor(img.transpose(0, 3, 1, 2)),
                        scale_factor=2, mode="nearest").numpy()
    ours = upsample_nearest_2x(jnp.asarray(img))
    np.testing.assert_allclose(_nchw(ours), ref)


def test_upsample_bilinear_2x_align_matches_torch():
    img = RNG.uniform(0, 1, (2, 7, 9, 4)).astype(np.float32)
    ref = F.interpolate(torch.tensor(img.transpose(0, 3, 1, 2)),
                        scale_factor=2, mode="bilinear",
                        align_corners=True).numpy()
    ours = upsample_bilinear_2x_align(jnp.asarray(img))
    np.testing.assert_allclose(_nchw(ours), ref, rtol=1e-5, atol=1e-6)
