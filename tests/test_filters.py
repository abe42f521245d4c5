"""Sobel/Laplace filter parity vs misc/image_filters.py."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from codeps_tpu.ops.filters import laplace, sobel

from misc.image_filters import Laplace as RefLaplace
from misc.image_filters import Sobel as RefSobel

RNG = np.random.default_rng(2)


def test_sobel_matches_reference():
    img = RNG.uniform(0, 1, (2, 1, 12, 16)).astype(np.float32)
    ref = RefSobel()(torch.tensor(img)).detach().numpy()
    ours = np.asarray(sobel(jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_laplace_matches_reference():
    img = RNG.uniform(0, 1, (2, 1, 12, 16)).astype(np.float32)
    ref = RefLaplace()(torch.tensor(img)).detach().numpy()
    ours = np.asarray(laplace(jnp.asarray(img.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)
