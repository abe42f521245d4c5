"""Image resizing with torch ``F.interpolate`` semantics for NHWC tensors.

The multi-scale photometric loss downscales images/depths with bilinear
(align_corners=False) and labels with nearest interpolation
(/root/reference/algos/depth.py:158-173, 278-288). ``jax.image.resize``
uses different (anti-aliased) kernels when downscaling, so we implement
torch's pure sampling semantics directly.

Bilinear resize is expressed as two small dense matmuls
(``Wy @ img @ Wx^T``) — separable interpolation rides the MXU instead of
scattered gathers, and the weight matrices are compile-time constants for
static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_weight_matrix(in_size: int, out_size: int,
                          align_corners: bool) -> np.ndarray:
    """(out_size, in_size) row-stochastic linear interpolation matrix."""
    weights = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # torch maps the single output pixel to src coord 0 (align_corners)
        # or scale*0.5-0.5 clamped to 0 (half-pixel); both hit index 0 when
        # in_size >= 1 with non-negative clamping.
        if align_corners:
            weights[0, 0] = 1.0
            return weights
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / max(out_size - 1, 1)
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = min(max(src, 0.0), in_size - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        frac = src - lo
        weights[i, lo] += 1.0 - frac
        weights[i, hi] += frac
    return weights


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    """torch 'nearest' source index: floor(dst * in/out) (asymmetric)."""
    idx = np.floor(np.arange(out_size) * in_size / out_size).astype(np.int32)
    return np.minimum(idx, in_size - 1)


def resize_bilinear(img: jnp.ndarray, size: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of (B, H, W, C) to (B, size[0], size[1], C)."""
    _, h, w, _ = img.shape
    out_h, out_w = size
    if (h, w) == (out_h, out_w):
        return img
    wy = jnp.asarray(_linear_weight_matrix(h, out_h, align_corners),
                     dtype=img.dtype)
    wx = jnp.asarray(_linear_weight_matrix(w, out_w, align_corners),
                     dtype=img.dtype)
    # HIGHEST precision: interpolation weights must not be bf16-rounded
    # (JAX's default matmul precision on TPU is bfloat16).
    out = jnp.einsum("oh,bhwc->bowc", wy, img,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,bhwc->bhpc", wx, out,
                     precision=jax.lax.Precision.HIGHEST)
    return out


def resize_nearest(img: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of (B, H, W, C) with torch's asymmetric index rule."""
    _, h, w, _ = img.shape
    out_h, out_w = size
    if (h, w) == (out_h, out_w):
        return img
    iy = jnp.asarray(_nearest_index(h, out_h))
    ix = jnp.asarray(_nearest_index(w, out_w))
    return img[:, iy][:, :, ix]


def upsample_nearest_2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsampling (decoder feature upsample; scale_factor=2)."""
    return img.repeat(2, axis=1).repeat(2, axis=2)


def upsample_bilinear_2x_align(img: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample with align_corners=True (instance head path,
    /root/reference/models/instance_head.py:116-118)."""
    _, h, w, _ = img.shape
    return resize_bilinear(img, (2 * h, 2 * w), align_corners=True)


def resize(img: jnp.ndarray, size: tuple[int, int], mode: str,
           align_corners: bool = False) -> jnp.ndarray:
    if mode == "nearest":
        return resize_nearest(img, size)
    if mode == "bilinear":
        return resize_bilinear(img, size, align_corners)
    raise ValueError(f"Unsupported resize mode: {mode}")
