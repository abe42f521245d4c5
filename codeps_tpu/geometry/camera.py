"""Pinhole camera model as traced intrinsics arrays.

The reference keeps a Python ``CameraModel`` object per batch item and
round-trips intrinsics through ``.cpu().numpy()`` on every forward pass
(/root/reference/misc/camera_model.py:22-29, codeps/online_adap.py:94-100).
Here intrinsics stay on-device as a ``(B, 4)`` array ``[fx, fy, cx, cy]``
end-to-end, so camera math traces into the jitted step with no host sync.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_intrinsics(fx, fy, cx, cy) -> jnp.ndarray:
    """Stack scalars (or batched vectors) into a (..., 4) intrinsics array."""
    return jnp.stack(
        [jnp.asarray(fx), jnp.asarray(fy), jnp.asarray(cx), jnp.asarray(cy)],
        axis=-1)


def scale_intrinsics(intrinsics: jnp.ndarray, scale_u: float,
                     scale_v: float) -> jnp.ndarray:
    """Scale intrinsics by per-axis image-resize factors.

    Parity: CameraModel.get_scaled_model
    (/root/reference/misc/camera_model.py:31-34).
    """
    scale = jnp.asarray([scale_u, scale_v, scale_u, scale_v],
                        dtype=intrinsics.dtype)
    return intrinsics * scale


def scale_intrinsics_to_size(intrinsics: jnp.ndarray,
                             src_size: tuple[int, int],
                             dst_size: tuple[int, int]) -> jnp.ndarray:
    """Rescale intrinsics from image size ``src`` to ``dst`` (height, width).

    Parity: CameraModel.get_scaled_model_image_size
    (/root/reference/misc/camera_model.py:36-41).
    """
    scale_u = dst_size[1] / src_size[1]
    scale_v = dst_size[0] / src_size[0]
    return scale_intrinsics(intrinsics, scale_u, scale_v)


def backproject(depth: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Lift a depth map to a camera-frame point cloud.

    The reference normalizes viewing rays and rescales by ``depth/|ray_z|``
    (/root/reference/misc/image_warper.py:68-87, misc/camera_model.py:52-71);
    algebraically that is ``P = depth * ((u-cx)/fx, (v-cy)/fy, 1)``, which is
    what we compute directly (no sqrt, VPU-friendly).

    Args:
      depth: (B, H, W, 1) depth map.
      intrinsics: (B, 4) ``[fx, fy, cx, cy]``.

    Returns:
      (B, H, W, 3) xyz point cloud.
    """
    b, height, width, _ = depth.shape
    dtype = depth.dtype
    u = jnp.arange(width, dtype=dtype)[None, None, :, None]
    v = jnp.arange(height, dtype=dtype)[None, :, None, None]
    fx = intrinsics[:, 0].reshape(b, 1, 1, 1).astype(dtype)
    fy = intrinsics[:, 1].reshape(b, 1, 1, 1).astype(dtype)
    cx = intrinsics[:, 2].reshape(b, 1, 1, 1).astype(dtype)
    cy = intrinsics[:, 3].reshape(b, 1, 1, 1).astype(dtype)
    x3d = depth * (u - cx) / fx
    y3d = depth * (v - cy) / fy
    return jnp.concatenate([x3d, y3d, depth], axis=-1)


def project(points: jnp.ndarray, intrinsics: jnp.ndarray,
            eps: float = 1e-5) -> jnp.ndarray:
    """Project camera-frame points to pixel coordinates.

    Parity: CameraModel.get_image_point with the z-clamp from
    _PointcloudToImage (/root/reference/misc/image_warper.py:32,
    misc/camera_model.py:43-50).

    Args:
      points: (B, H, W, 3) xyz.
      intrinsics: (B, 4).

    Returns:
      (B, H, W, 2) pixel coordinates (u, v).
    """
    b = points.shape[0]
    dtype = points.dtype
    fx = intrinsics[:, 0].reshape(b, 1, 1).astype(dtype)
    fy = intrinsics[:, 1].reshape(b, 1, 1).astype(dtype)
    cx = intrinsics[:, 2].reshape(b, 1, 1).astype(dtype)
    cy = intrinsics[:, 3].reshape(b, 1, 1).astype(dtype)
    z = jnp.maximum(points[..., 2], eps)
    u = points[..., 0] / z * fx + cx
    v = points[..., 1] / z * fy + cy
    return jnp.stack([u, v], axis=-1)


def intrinsics_from_numpy(fx: float, fy: float, cx: float, cy: float,
                          batch: int = 1) -> np.ndarray:
    """Host-side helper: replicate one camera over a batch."""
    one = np.asarray([fx, fy, cx, cy], dtype=np.float32)
    return np.tile(one[None], (batch, 1))
