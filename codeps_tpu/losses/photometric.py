"""Photometric (view-reconstruction) losses.

Parity targets:
  - SSIMLoss                (/root/reference/algos/depth.py:110-155)
  - ReconstructionLoss      (/root/reference/algos/depth.py:176-326)

Design notes (TPU-first):
  - One traced function per resolution; the multi-scale pyramid unrolls at
    trace time over static scale sizes, so XLA fuses the downscale + warp +
    SSIM + automask chain per scale.
  - Camera intrinsics are traced (B, 4) arrays; scale-space cameras are a
    vector multiply, not Python objects.
  - The automask tie-break noise uses an explicit PRNG key.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from codeps_tpu.geometry.camera import scale_intrinsics_to_size
from codeps_tpu.geometry.warp import warp_image
from codeps_tpu.ops.resize import resize_bilinear, resize_nearest

_SSIM_C1 = 0.01 ** 2
_SSIM_C2 = 0.03 ** 2


def _avg_pool_3x3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 stride-1 average pool after 1px reflection pad (NHWC).

    Parity: nn.ReflectionPad2d(1) + nn.AvgPool2d(3, 1)
    (/root/reference/algos/depth.py:118-123,141-149).
    """
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID")
    return out / 9.0


def ssim_target_stats(target_img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Precompute the target-side SSIM pools ``(mu_y, pool(y*y))``.

    ``reconstruction_loss`` evaluates 4 photometric errors per scale (2
    warped + 2 identity) against the SAME target pyramid level; the
    target's mean/second-moment pools are identical across those calls,
    so computing them once drops 6 of the 24 reduce-windows per scale.
    Bit-exact: same ops on the same inputs, CSE made explicit.
    """
    return (_avg_pool_3x3_reflect(target_img),
            _avg_pool_3x3_reflect(target_img * target_img))


def ssim(src_img: jnp.ndarray, target_img: jnp.ndarray,
         target_stats: tuple[jnp.ndarray, jnp.ndarray] | None = None
         ) -> jnp.ndarray:
    """SSIM-based dissimilarity: clamp((1 - SSIM)/2, 0, 1), per pixel/channel.

    Parity: SSIMLoss.__call__ (/root/reference/algos/depth.py:128-155).
    ``target_stats`` optionally carries ``ssim_target_stats(target_img)``.
    """
    mu_x = _avg_pool_3x3_reflect(src_img)
    if target_stats is None:
        target_stats = ssim_target_stats(target_img)
    mu_y, pool_y2 = target_stats

    sigma_x = _avg_pool_3x3_reflect(src_img * src_img) - mu_x * mu_x
    sigma_y = pool_y2 - mu_y * mu_y
    sigma_xy = _avg_pool_3x3_reflect(src_img * target_img) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _SSIM_C1) * (2.0 * sigma_xy + _SSIM_C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _SSIM_C1) * (sigma_x + sigma_y + _SSIM_C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) / 2.0, 0.0, 1.0)


def photometric_error(pred_img: jnp.ndarray, target_img: jnp.ndarray,
                      alpha: float = 0.85,
                      target_stats: tuple[jnp.ndarray, jnp.ndarray] | None = None
                      ) -> jnp.ndarray:
    """alpha*SSIM + (1-alpha)*L1, channel-averaged -> (B, H, W, 1).

    Parity: ReconstructionLoss._compute_loss
    (/root/reference/algos/depth.py:221-237).
    """
    l1 = jnp.mean(jnp.abs(pred_img - target_img), axis=-1, keepdims=True)
    ssim_term = jnp.mean(ssim(pred_img, target_img, target_stats),
                         axis=-1, keepdims=True)
    return alpha * ssim_term + (1.0 - alpha) * l1


def reconstruction_loss(
    rng: jax.Array,
    intrinsics: jnp.ndarray,
    images: Sequence[jnp.ndarray],
    depth_map: jnp.ndarray,
    poses: Sequence[jnp.ndarray],
    object_motion_maps: Sequence[jnp.ndarray] | None = None,
    num_scales: int = 5,
    alpha: float = 0.85,
    identity_noise_scale: float = 1e-5,
    dtype=jnp.float32,
    per_sample: bool = False,
) -> jnp.ndarray:
    """Multi-scale photometric loss with Monodepth2 auto-masking.

    Parity: ReconstructionLoss.__call__
    (/root/reference/algos/depth.py:239-326). The final full-resolution depth
    is *downscaled* to each pyramid level (not per-scale predictions).

    Args:
      rng: PRNG key for the automask tie-break noise (depth.py:316-318).
      intrinsics: (B, 4) at the input resolution.
      images: triplet [t, t-1, t+1], each (B, H, W, 3).
      depth_map: (B, H, W, 1) depth of frame t.
      poses: [T(t->t-1), T(t->t+1)], each (B, 4, 4).
      object_motion_maps: optional pair of (B, H, W, 3) scene-flow maps.
      dtype: element type for the IMAGE-SPACE math (pyramids, warp
        payload, SSIM/L1, automask). Geometry (depth backprojection,
        poses, sampling grids) and the final per-scale means stay
        float32. bfloat16 here matches the conv compute policy
        (cfg.tpu.compute_dtype) — 8-bit image content loses nothing
        metric-relevant and the elementwise chains halve their HBM
        traffic; the f32 default preserves bit parity with the torch
        formulas for the golden tests.

      per_sample: return a (B,) float32 vector of per-sample losses
        (batched multi-domain adapt path; the batch mean of the vector
        equals the scalar form up to summation order).

    Returns:
      scalar float32 loss, or (B,) when ``per_sample``.
    """
    _, height, width, _ = images[0].shape
    target = images[0].astype(dtype)

    # NOTE (measured on v5e): fusing all 10 warps (5 scales x 2 frames)
    # into one flattened gather (ops/grid_sample.grid_sample_many)
    # REGRESSED the adapt step 3.14 -> 2.38 steps/s — the per-warp
    # gathers overlap with conv compute in XLA's schedule, while one
    # mega-gather serializes the critical path. Kept per-warp.
    batch = images[0].shape[0]
    total = jnp.zeros((batch,) if per_sample else (), dtype=jnp.float32)
    for s in range(num_scales):
        scaled_h, scaled_w = height // (2 ** s), width // (2 ** s)
        intr_s = scale_intrinsics_to_size(intrinsics, (height, width),
                                          (scaled_h, scaled_w))
        target_s = resize_bilinear(target, (scaled_h, scaled_w))
        # depth pyramid stays f32: it feeds the sampling grids
        depth_s = resize_bilinear(depth_map, (scaled_h, scaled_w))
        # target-side SSIM pools shared by all 4 photometric errors at
        # this scale (bit-exact explicit CSE; see ssim_target_stats)
        tstats = ssim_target_stats(target_s)

        recon_losses = []
        frames_s = []
        for i, frame in enumerate(images[1:]):
            frame_s = resize_bilinear(frame.astype(dtype),
                                      (scaled_h, scaled_w))
            frames_s.append(frame_s)
            motion_s = None
            if object_motion_maps is not None:
                motion_s = resize_bilinear(object_motion_maps[i],
                                           (scaled_h, scaled_w))
            pred = warp_image(intr_s, frame_s, depth_s, poses[i],
                              object_motion=motion_s)
            # the bilinear tap combine runs at grid (f32) precision;
            # bring the prediction back to the image dtype for SSIM/L1
            recon_losses.append(photometric_error(pred.astype(dtype),
                                                  target_s, alpha, tstats))

        identity_losses = [photometric_error(frame_s, target_s, alpha, tstats)
                           for frame_s in frames_s]
        # The automask min + tie-break noise run in f32 regardless of the
        # image dtype: the 1e-5 noise is below bf16 resolution of the
        # per-pixel errors, so adding it at bf16 would round to a no-op
        # and silently disable the Monodepth2 identity tie-break
        # (depth.py:316-318) — exactly where bf16 quantization makes
        # exact recon==identity ties more common.
        identity = jnp.concatenate(identity_losses, axis=-1).astype(
            jnp.float32)
        if identity_noise_scale:
            rng, sub = jax.random.split(rng)
            identity = identity + jax.random.normal(
                sub, identity.shape, jnp.float32) * identity_noise_scale

        combined = jnp.concatenate(
            [jnp.concatenate(recon_losses, axis=-1).astype(jnp.float32),
             identity], axis=-1)
        per_pixel = jnp.min(combined, axis=-1)
        if per_sample:
            total = total + jnp.mean(per_pixel, axis=(1, 2)) / (2 ** s)
        else:
            total = total + jnp.mean(per_pixel) / (2 ** s)

    return total / num_scales


def reconstruction_loss_semantic(
    intrinsics: jnp.ndarray,
    semantic_masks: Sequence[jnp.ndarray],
    depth_map: jnp.ndarray,
    poses: Sequence[jnp.ndarray],
    num_scales: int = 5,
    alpha: float = 0.85,
) -> jnp.ndarray:
    """Semantic-mask variant of the reconstruction loss (no automask).

    Parity: the ``semantic_mask is not None`` branch of
    ReconstructionLoss.__call__ (/root/reference/algos/depth.py:284-308):
    masks are nearest-downscaled, warped with nearest sampling, and the
    photometric error is applied to the float class maps directly.
    """
    _, height, width, _ = depth_map.shape
    target = semantic_masks[0].astype(jnp.float32)
    if target.ndim == 3:
        target = target[..., None]

    total = jnp.zeros((), dtype=jnp.float32)
    for s in range(num_scales):
        scaled_h, scaled_w = height // (2 ** s), width // (2 ** s)
        intr_s = scale_intrinsics_to_size(intrinsics, (height, width),
                                          (scaled_h, scaled_w))
        target_s = resize_nearest(target, (scaled_h, scaled_w))
        depth_s = resize_bilinear(depth_map, (scaled_h, scaled_w))
        tstats = ssim_target_stats(target_s)

        losses = []
        for i, frame in enumerate(semantic_masks[1:]):
            frame_f = frame.astype(jnp.float32)
            if frame_f.ndim == 3:
                frame_f = frame_f[..., None]
            frame_s = resize_nearest(frame_f, (scaled_h, scaled_w))
            pred = warp_image(intr_s, frame_s, depth_s, poses[i],
                              interp_mode="nearest")
            losses.append(photometric_error(pred, target_s, alpha, tstats))
        per_pixel = jnp.concatenate(losses, axis=-1)
        total = total + jnp.mean(per_pixel) / (2 ** s)

    return total / num_scales
