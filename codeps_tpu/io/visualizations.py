"""Visualization panels (parity: io_utils/visualizations.py:14-548).

Builds numpy RGB uint8 panels for logging: denormalized RGB, magma depth,
semantic label colors, center heatmap, HSV-angle offsets, panoptic maps
with instance boundaries, and a confusion-matrix figure. Consumers hand
these to wandb/log_images or save them to disk.
"""

from __future__ import annotations

import colorsys
from typing import Dict, Optional

import numpy as np

from codeps_tpu.data.labels import get_labels


def denormalize_rgb(image: np.ndarray, rgb_mean, rgb_std) -> np.ndarray:
    """(H, W, 3) normalized float -> uint8 RGB (uint8 passes through:
    the uint8-transfer path keeps raw bytes on the host)."""
    if image.dtype == np.uint8:
        return image
    out = image * np.asarray(rgb_std) + np.asarray(rgb_mean)
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)


def colorize_depth(depth: np.ndarray, min_depth: float = 0.1,
                   max_depth: float = 80.0) -> np.ndarray:
    """Magma-mapped inverse depth (reference plots disparity-like maps)."""
    import matplotlib.cm as cm
    disp = 1.0 / np.clip(depth, min_depth, max_depth)
    disp = (disp - disp.min()) / max(disp.max() - disp.min(), 1e-9)
    return (cm.magma(disp)[..., :3] * 255).astype(np.uint8)


def colorize_semantic(semantic: np.ndarray, remove_classes=(),
                      label_mode: str = "codeps") -> np.ndarray:
    labels = get_labels(list(remove_classes), label_mode)
    out = np.zeros(semantic.shape + (3,), np.uint8)
    for label in labels:
        out[semantic == label.trainId] = label.color
    return out


def colorize_center(center: np.ndarray) -> np.ndarray:
    """(H, W) or (H, W, 1) heatmap -> red-hot overlay."""
    if center.ndim == 3:
        center = center[..., 0]
    heat = np.clip(center, 0, 1)
    out = np.zeros(center.shape + (3,), np.uint8)
    out[..., 0] = (heat * 255).astype(np.uint8)
    out[..., 1] = (heat * 96).astype(np.uint8)
    return out


def colorize_offset_fast(offset: np.ndarray) -> np.ndarray:
    """Vectorized HSV offset panel."""
    import matplotlib.colors as mcolors
    angle = (np.arctan2(offset[..., 0], offset[..., 1]) + np.pi) / (2 * np.pi)
    mag = np.linalg.norm(offset, axis=-1)
    mag = mag / max(mag.max(), 1e-9)
    hsv = np.stack([angle, np.ones_like(angle), mag], axis=-1)
    return (mcolors.hsv_to_rgb(hsv) * 255).astype(np.uint8)


def colorize_motion_map(motion_maps) -> np.ndarray:
    """Side-by-side object-motion panel for one sample.

    Parity: _add_motion_map (/root/reference/io_utils/visualizations.py:309-342):
    the sflow pair [m(t->t-1), m(t->t+1)] is rendered as
    [-m0, m1] — negating the backward map so both halves share the
    forward-motion sign — mean-reduced over the (x, y, z) channels,
    then viridis-mapped with per-half min/max normalization.

    Args:
      motion_maps: pair of (H, W, 3) NHWC scene-flow maps.
    Returns:
      (H, 2W, 3) uint8 panel.
    """
    import matplotlib.cm as cm

    halves = []
    for signed in (-np.asarray(motion_maps[0]), np.asarray(motion_maps[1])):
        mean = signed.mean(axis=-1)
        lo, hi = float(mean.min()), float(mean.max())
        norm = (mean - lo) / max(hi - lo, 1e-12)
        halves.append((cm.viridis(norm)[..., :3] * 255).astype(np.uint8))
    return np.concatenate(halves, axis=1)


def colorize_panoptic(panoptic: np.ndarray, remove_classes=(),
                      label_mode: str = "codeps",
                      label_divisor: int = 1000,
                      seed: int = 0) -> np.ndarray:
    """Class colors, per-instance jitter, white instance boundaries."""
    rng = np.random.default_rng(seed)
    semantic = np.where(panoptic < 0, 255, panoptic // label_divisor)
    out = colorize_semantic(semantic, remove_classes, label_mode)

    for pan_id in np.unique(panoptic):
        if pan_id < 0 or pan_id % label_divisor == 0:
            continue
        mask = panoptic == pan_id
        jitter = rng.integers(-40, 40, 3)
        out[mask] = np.clip(out[mask].astype(int) + jitter, 0, 255)
        # boundary: pixels whose 4-neighborhood leaves the instance.
        # Edge-padded shifts (np.roll would wrap top<->bottom /
        # left<->right and mis-outline border-touching instances).
        padded = np.pad(mask, 1, mode="edge")
        boundary = mask & ~(
            padded[:-2, 1:-1] & padded[2:, 1:-1]
            & padded[1:-1, :-2] & padded[1:-1, 2:])
        out[boundary] = (255, 255, 255)
    return out


def plot_confusion_matrix(conf_mat: np.ndarray, remove_classes=(),
                          label_mode: str = "codeps"):
    """Normalized confusion-matrix figure
    (io_utils/visualizations.py:172-...)."""
    # matplotlib.figure.Figure directly: a pyplot-managed figure would
    # sit in the global figure registry forever (one leak per logging
    # interval) unless every caller remembered plt.close().
    from matplotlib.figure import Figure

    labels = get_labels(list(remove_classes), label_mode)
    names = [label.name for label in labels]
    mat = np.asarray(conf_mat, np.float64)
    row_sum = mat.sum(axis=1, keepdims=True)
    norm = np.divide(mat, row_sum, out=np.zeros_like(mat),
                     where=row_sum > 0)

    fig = Figure(figsize=(8, 7))
    ax = fig.subplots()
    im = ax.imshow(norm, cmap="viridis", vmin=0, vmax=1)
    ax.set_xticks(range(len(names)))
    ax.set_yticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=7)
    ax.set_yticklabels(names, fontsize=7)
    ax.set_xlabel("prediction")
    ax.set_ylabel("ground truth")
    fig.colorbar(im)
    fig.tight_layout()
    return fig


def gen_visualizations(sample: Dict, results: Dict, rgb_mean, rgb_std,
                       remove_classes=(), label_mode: str = "codeps",
                       max_count: int = 5) -> Dict[str, np.ndarray]:
    """Panel dict for one batch (io_utils/visualizations.py:14-170)."""
    panels: Dict[str, np.ndarray] = {}
    frames = sample.get("frames")
    if frames is not None:
        frames = np.asarray(frames)  # asarray(None) would defeat the guards
    batch = frames.shape[0] if frames is not None else 1
    for b in range(min(batch, max_count)):
        prefix = f"{b}"
        if frames is not None:
            panels[f"rgb_{prefix}"] = denormalize_rgb(
                frames[b, 0], rgb_mean, rgb_std)
        if results.get("depth") is not None:
            panels[f"depth_{prefix}"] = colorize_depth(
                np.asarray(results["depth"])[b, ..., 0])
        if results.get("object_motion_map") is not None:
            # sflow configs: [m(t->t-1), m(t->t+1)] pair per sample
            # (io_utils/visualizations.py:36-38)
            panels[f"motion_{prefix}"] = colorize_motion_map(
                [np.asarray(m)[b] for m in results["object_motion_map"]])
        if results.get("semantic") is not None:
            panels[f"semantic_{prefix}"] = colorize_semantic(
                np.asarray(results["semantic"])[b], remove_classes,
                label_mode)
        if results.get("center") is not None:
            panels[f"center_{prefix}"] = colorize_center(
                np.asarray(results["center"])[b])
        if results.get("offset") is not None:
            panels[f"offset_{prefix}"] = colorize_offset_fast(
                np.asarray(results["offset"])[b])
        if results.get("panoptic") is not None:
            panels[f"panoptic_{prefix}"] = colorize_panoptic(
                np.asarray(results["panoptic"])[b], remove_classes,
                label_mode)
    return panels
