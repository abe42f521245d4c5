"""On-device image normalization for uint8 host->device transfers.

The reference normalizes on the CPU inside the data workers
(datasets/preprocessing.py:12-18), shipping float32 images to the device
(4x the bytes of the raw uint8 frames). With
``dataset.normalization.uint8_transfer: true`` the host pipeline keeps
raw uint8 and the jitted steps normalize as their first op — the same
math, 4x less H2D traffic.

Dtype is static under jit, so ``maybe_normalize`` compiles to a no-op for
pre-normalized float inputs: enabling the option never double-normalizes.
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def maybe_normalize(images: jnp.ndarray,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """Normalize channel-last uint8 images; pass floats through untouched.

    Args:
      images: (..., 3) uint8 raw frames or float32 already-normalized.
    """
    if images.dtype != jnp.uint8:
        return images
    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)
    return (images.astype(jnp.float32) / 255.0 - mean_arr) / std_arr
