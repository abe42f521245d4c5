"""Instance-head losses (Panoptic-DeepLab style).

Parity targets: CenterLoss / OffsetLoss / BinaryMaskLoss
(/root/reference/algos/instance_seg.py:12-51). As in the reference, the
``pixel_weights`` arguments are accepted but unused in the reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from codeps_tpu.losses.semantic import cross_entropy_per_pixel


def center_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                pixel_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """MSE over the center heatmap; plain mean reduction."""
    del pixel_weights  # unused, matching the reference reduction
    diff = prediction - target
    return jnp.mean(diff * diff)


def offset_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                pixel_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1 over the (y, x) offset maps; plain mean reduction."""
    del pixel_weights  # unused, matching the reference reduction
    return jnp.mean(jnp.abs(prediction - target))


def binary_mask_loss(prediction: jnp.ndarray, target: jnp.ndarray,
                     ignore_index: int = 255) -> jnp.ndarray:
    """CE over the 2-channel thing-mask logits.

    torch's reduction='none' emits 0 for ignored pixels and the subsequent
    ``.mean()`` still divides by the full pixel count — replicated.
    """
    loss = cross_entropy_per_pixel(prediction, target.astype(jnp.int32),
                                   ignore_index=ignore_index)
    return jnp.mean(loss)


def ema_consistency_loss(prediction: jnp.ndarray,
                         ema_prediction: jnp.ndarray) -> jnp.ndarray:
    """-sigmoid(pred) * log(sigmoid(ema) + 1e-10), mean.

    Parity: the center/offset EMA consistency terms in
    InstanceSegAlgo.adaptation (/root/reference/algos/instance_seg.py:162-173).
    """
    return jnp.mean(-jax.nn.sigmoid(prediction)
                    * jnp.log(jax.nn.sigmoid(ema_prediction) + 1e-10))
