"""SE(3) pose math: axis-angle + translation -> 4x4 transforms.

Parity targets: PoseHead.transformation_from_parameters / rot_from_axisangle /
get_translation_matrix (/root/reference/models/pose_head.py:56-137), which
follow Monodepth2. Built batched with stacked tensor ops (no per-element
scatter writes, which XLA handles poorly).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rot_from_axisangle(axisangle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (B, 3) axis-angle -> (B, 4, 4) rotation.

    Parity: models/pose_head.py:79-119 (note the reference's 1e-7 guard on
    the angle norm).
    """
    angle = jnp.linalg.norm(axisangle, axis=-1, keepdims=True)  # (B, 1)
    axis = axisangle / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    c1 = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    xs, ys, zs = x * sa, y * sa, z * sa
    x_c, y_c, z_c = x * c1, y * c1, z * c1
    xy_c, yz_c, zx_c = x * y_c, y * z_c, z * x_c

    zeros = jnp.zeros_like(ca)
    ones = jnp.ones_like(ca)
    rot = jnp.stack([
        x * x_c + ca, xy_c - zs, zx_c + ys, zeros,
        xy_c + zs, y * y_c + ca, yz_c - xs, zeros,
        zx_c - ys, yz_c + xs, z * z_c + ca, zeros,
        zeros, zeros, zeros, ones,
    ], axis=-1).reshape(axisangle.shape[0], 4, 4)
    return rot


def translation_matrix(translation: jnp.ndarray) -> jnp.ndarray:
    """(B, 3) translation -> (B, 4, 4) matrix (models/pose_head.py:121-137)."""
    batch = translation.shape[0]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=translation.dtype),
                           (batch, 4, 4))
    pad = jnp.concatenate(
        [translation, jnp.zeros((batch, 1), translation.dtype)], axis=-1)
    return eye + pad[:, :, None] * jnp.asarray(
        [0.0, 0.0, 0.0, 1.0], translation.dtype)[None, None, :]


def transformation_from_parameters(axisangle: jnp.ndarray,
                                   translation: jnp.ndarray,
                                   invert: bool = False) -> jnp.ndarray:
    """Compose axis-angle + translation into a 4x4 SE(3) transform.

    Parity: models/pose_head.py:56-77. ``invert=True`` transposes R, negates
    t, and composes ``R^T @ T(-t)`` instead of ``T(t) @ R``.
    """
    rot = rot_from_axisangle(axisangle)
    t = translation
    if invert:
        rot = jnp.swapaxes(rot, 1, 2)
        t = -t
    trans = translation_matrix(t)
    if invert:
        return jnp.matmul(rot, trans, precision=jax.lax.Precision.HIGHEST)
    return jnp.matmul(trans, rot, precision=jax.lax.Precision.HIGHEST)


def transform_points(transform: jnp.ndarray,
                     points: jnp.ndarray) -> jnp.ndarray:
    """Apply (B, 4, 4) transforms to (B, H, W, 3) points (homogeneous).

    Parity: CoordinateWarper's bmm over homogeneous coordinates
    (/root/reference/misc/image_warper.py:118-138). The reference divides by
    the homogeneous w; for SE(3) w == 1 but we keep the division for exact
    behavioral parity with arbitrary 4x4 inputs.
    """
    rot = transform[:, :3, :3].astype(points.dtype)        # (B, 3, 3)
    trans = transform[:, :3, 3].astype(points.dtype)       # (B, 3)
    w_row = transform[:, 3, :].astype(points.dtype)        # (B, 4)
    # HIGHEST precision: pose matrices are near-identity; bf16 rounding of
    # the contraction would corrupt sub-pixel warp coordinates.
    out = jnp.einsum("bij,bhwj->bhwi", rot, points,
                     precision=jax.lax.Precision.HIGHEST)
    out = out + trans[:, None, None, :]
    w = (jnp.einsum("bj,bhwj->bhw", w_row[:, :3], points,
                    precision=jax.lax.Precision.HIGHEST)
         + w_row[:, 3][:, None, None])
    return out / w[..., None]
