"""Faithful reimplementation of kornia.contrib.distance_transform.

The reference's conf_instance_mixup computes its paste x-offsets from
``kornia.contrib.distance_transform(thing_msk)`` (mixup.py:587-590).
kornia is not installable in this environment (no network), so this
module reconstructs its published algorithm — the iterative
convolution scheme of Pham et al., "Distance transform via convolution"
(the kornia implementation): per iteration, convolve the reached-set
indicator with an exp(-hypot(dy, dx)/h) kernel (replicate border),
soft-min distances via cdt = -h*log(conv), assign newly reached pixels
out = i*(kernel_size//2) + cdt, and grow the reached set. Defaults
kernel_size=3, h=0.35 match the reference call (it passes neither).

Used by:
  - tests/test_replay_buffer.py::test_conf_instance_dt_vs_kornia_algo —
    fixture check that codeps_tpu.data.mixup.euclidean_dist_row (the
    exact Euclidean limit of this chamfer approximation) selects the
    same paste offsets;
  - scripts/parity_adapt.py — injected into the kornia stub so the
    reference's conf_instance_mixup path runs end-to-end.

Reconstruction caveat (documented, unavoidable without network access):
this follows kornia's algorithm as published; it cannot be diffed
against the pip package byte-for-byte. The quantity the reference
consumes is only argmax(dist_map[center_y, :]), which the fixture test
cross-checks against the exact transform.
"""

from __future__ import annotations

import math

import numpy as np


def kornia_distance_transform(image: np.ndarray, kernel_size: int = 3,
                              h: float = 0.35) -> np.ndarray:
    """Approximate distance transform of a binary (H, W) mask, kornia's
    conv-chamfer algorithm. Non-zero pixels get 0; unreachable pixels
    (all-zero mask) stay 0, like kornia's output."""
    if kernel_size % 2 != 1:
        raise ValueError("kernel_size must be odd")
    height, width = image.shape
    rad = kernel_size // 2
    n_iters = math.ceil(max(height, width) / rad)
    oy, ox = np.mgrid[-rad:rad + 1, -rad:rad + 1]
    kernel = np.exp(-np.hypot(oy, ox).astype(np.float64) / h)

    out = np.zeros((height, width), np.float64)
    boundary = (np.asarray(image) > 0).astype(np.float64)
    for i in range(n_iters):
        padded = np.pad(boundary, rad, mode="edge")
        conv = np.zeros_like(out)
        for dy in range(kernel_size):
            for dx in range(kernel_size):
                conv += kernel[dy, dx] * padded[dy:dy + height,
                                                dx:dx + width]
        with np.errstate(divide="ignore"):
            cdt = -h * np.log(conv)
        # kornia: torch.nan_to_num(cdt, posinf=0.0) — unreached pixels
        # (log 0 = +inf) contribute nothing this iteration.
        cdt[np.isposinf(cdt)] = 0.0
        newly = cdt > 0
        if not newly.any():
            break
        out[newly] = i * rad + cdt[newly]
        boundary[newly] = 1.0
    return out.astype(np.float32)


def torch_distance_transform(image, kernel_size: int = 3, h: float = 0.35):
    """torch-tensor wrapper with kornia's (B, C, H, W) calling
    convention, for injection into the reference-import kornia stub."""
    import torch

    arr = image.detach().cpu().numpy()
    batch, chans, height, width = arr.shape
    out = np.stack([
        np.stack([kornia_distance_transform(arr[b, c], kernel_size, h)
                  for c in range(chans)])
        for b in range(batch)])
    return torch.from_numpy(out).to(image.dtype)
