"""Image derivative filters.

Parity: misc/image_filters.py (/root/reference/misc/image_filters.py:5-45)
— Sobel gradient magnitude and 8-neighbor Laplacian, VALID padding.
(Imported but unused by the reference's depth algo; provided for API
completeness.) NHWC single-channel inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_SOBEL_GX = np.asarray([[1.0, 0.0, -1.0],
                        [2.0, 0.0, -2.0],
                        [1.0, 0.0, -1.0]], np.float32)
_SOBEL_GY = np.asarray([[1.0, 2.0, 1.0],
                        [0.0, 0.0, 0.0],
                        [-1.0, -2.0, -1.0]], np.float32)
_LAPLACE = np.asarray([[1.0, 1.0, 1.0],
                       [1.0, -8.0, 1.0],
                       [1.0, 1.0, 1.0]], np.float32)


def _conv2d_valid(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) VALID conv with a (3, 3, 1, O) kernel."""
    return jax.lax.conv_general_dilated(
        img, jnp.asarray(kernel), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


def sobel(img: jnp.ndarray) -> jnp.ndarray:
    """Gradient magnitude sqrt(Gx^2 + Gy^2 + 1e-10), (B, H-2, W-2, 1)."""
    kernel = np.stack([_SOBEL_GX, _SOBEL_GY], axis=-1)[:, :, None, :]
    grads = _conv2d_valid(img, kernel)
    return jnp.sqrt(jnp.sum(grads * grads, axis=-1, keepdims=True) + 1e-10)


def laplace(img: jnp.ndarray) -> jnp.ndarray:
    """8-neighbor Laplacian, (B, H-2, W-2, 1)."""
    kernel = _LAPLACE[:, :, None, None]
    return _conv2d_valid(img, kernel)
