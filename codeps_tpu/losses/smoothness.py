"""Disparity smoothness and scene-flow regularizers.

Parity targets:
  - EdgeAwareSmoothnessLoss (/root/reference/algos/depth.py:58-107)
  - FlowSmoothnessLoss      (/root/reference/algos/depth.py:15-34)
  - FlowSparsityLoss        (/root/reference/algos/depth.py:37-52)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def edge_aware_smoothness_loss(target_image: jnp.ndarray,
                               disparity: jnp.ndarray,
                               per_sample: bool = False) -> jnp.ndarray:
    """Mean-normalized disparity gradients weighted by exp(-|dI|). NHWC.

    Args:
      target_image: (B, H, W, 3) RGB.
      disparity: (B, H, W, 1).
      per_sample: return a (B,) vector of per-sample losses instead of
        the batch mean (used by the batched multi-domain adapt path —
        equal pixel counts make the batch mean the mean of this vector).
    """
    mean_disp = jnp.mean(disparity, axis=(1, 2), keepdims=True)
    norm_disp = disparity / (mean_disp + 1e-7)

    grad_disp_x = jnp.abs(norm_disp[:, :, :-1, :] - norm_disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(norm_disp[:, :-1, :, :] - norm_disp[:, 1:, :, :])

    grad_img_x = jnp.mean(
        jnp.abs(target_image[:, :, :-1, :] - target_image[:, :, 1:, :]),
        axis=-1, keepdims=True)
    grad_img_y = jnp.mean(
        jnp.abs(target_image[:, :-1, :, :] - target_image[:, 1:, :, :]),
        axis=-1, keepdims=True)

    loss_x = grad_disp_x * jnp.exp(-grad_img_x)
    loss_y = grad_disp_y * jnp.exp(-grad_img_y)
    if per_sample:
        return (jnp.mean(loss_x, axis=(1, 2, 3))
                + jnp.mean(loss_y, axis=(1, 2, 3)))
    return jnp.mean(loss_x) + jnp.mean(loss_y)


def _flow_smoothness_single(flow_map: jnp.ndarray,
                            wrap_around: bool = True) -> jnp.ndarray:
    grad_x = flow_map - jnp.roll(flow_map, shift=1, axis=2)
    grad_y = flow_map - jnp.roll(flow_map, shift=1, axis=1)
    if not wrap_around:
        grad_x = grad_x[:, 1:, 1:, :]
        grad_y = grad_y[:, 1:, 1:, :]
    return jnp.mean(jnp.sqrt(grad_x * grad_x + grad_y * grad_y + 1e-7))


def flow_smoothness_loss(flow_maps: Sequence[jnp.ndarray],
                         wrap_around: bool = True) -> jnp.ndarray:
    """Roll-based total-variation smoothness, averaged over flow maps."""
    losses = [_flow_smoothness_single(f, wrap_around) for f in flow_maps]
    return sum(losses) / len(losses)


def _flow_sparsity_single(flow_map: jnp.ndarray) -> jnp.ndarray:
    abs_map = jnp.abs(flow_map)
    spatial_mean = jax.lax.stop_gradient(
        jnp.mean(abs_map, axis=(1, 2), keepdims=True))
    return jnp.mean(
        2.0 * spatial_mean * jnp.sqrt(abs_map / (spatial_mean + 1e-7) + 1.0))


def flow_sparsity_loss(flow_maps: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Group-sparsity prior on the object-motion maps."""
    losses = [_flow_sparsity_single(f) for f in flow_maps]
    return sum(losses) / len(losses)
