"""View-synthesis warping: depth + relative pose -> resampled neighbor frame.

Parity targets: ImageWarper / CoordinateWarper
(/root/reference/misc/image_warper.py:90-184). Fully batched and traced —
no Python camera objects, no host syncs. NHWC layout.
"""

from __future__ import annotations

import jax.numpy as jnp

from codeps_tpu.geometry import camera as cam
from codeps_tpu.geometry import pose as pose_lib
from codeps_tpu.ops.grid_sample import grid_sample


def warp_coordinates(intrinsics: jnp.ndarray, depth: jnp.ndarray,
                     transform: jnp.ndarray,
                     object_motion: jnp.ndarray | None = None) -> jnp.ndarray:
    """Compute normalized sampling coordinates for view synthesis.

    Each target pixel is backprojected with its depth, moved into the
    neighbor camera frame via ``transform`` (plus optional per-pixel object
    motion), and reprojected. Parity: CoordinateWarper.forward
    (/root/reference/misc/image_warper.py:100-144).

    Args:
      intrinsics: (B, 4) ``[fx, fy, cx, cy]``.
      depth: (B, H, W, 1) depth of the *target* frame.
      transform: (B, 4, 4) SE(3) mapping target-cam points to neighbor-cam.
      object_motion: optional (B, H, W, 3) additive scene-flow.

    Returns:
      (B, H, W, 2) normalized (u, v) in [-1, 1] (align_corners convention).
    """
    _, height, width, _ = depth.shape
    points = cam.backproject(depth, intrinsics)
    points = pose_lib.transform_points(transform, points)
    if object_motion is not None:
        # Reference adds motion to the homogeneous xyz before the w-divide
        # (image_warper.py:133-138); w == 1 for SE(3) so post-divide is equal.
        points = points + object_motion
    uv = cam.project(points, intrinsics)
    u_norm = (uv[..., 0] / (width - 1) - 0.5) * 2.0
    v_norm = (uv[..., 1] / (height - 1) - 0.5) * 2.0
    return jnp.stack([u_norm, v_norm], axis=-1)


def warp_image(intrinsics: jnp.ndarray, src_img: jnp.ndarray,
               depth: jnp.ndarray, transform: jnp.ndarray,
               interp_mode: str = "bilinear",
               object_motion: jnp.ndarray | None = None) -> jnp.ndarray:
    """Warp ``src_img`` (a neighbor frame) into the target view.

    Parity: ImageWarper.forward (/root/reference/misc/image_warper.py:147-184)
    with padding_mode='border', align_corners=True.
    """
    coords = warp_coordinates(intrinsics, depth, transform, object_motion)
    return grid_sample(src_img, coords, mode=interp_mode)
