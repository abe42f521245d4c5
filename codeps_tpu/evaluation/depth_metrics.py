"""Depth evaluation metrics (Monodepth2 protocol).

Parity: DepthEvaluator (/root/reference/eval/depth.py:7-131): per-item
masking of void GT, optional garg/eigen crop, optional GT-median scaling,
clamping to the eval range, then abs_rel / sq_rel / rmse / rmse_log /
a1-a3 averaged over the batch.

Vectorized with masked reductions + nan-median instead of the reference's
per-item boolean indexing (dynamic shapes don't trace).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

METRIC_KEYS = ("d_a1", "d_a2", "d_a3", "d_rmse", "d_rmse_log", "d_abs_rel",
               "d_sq_rel")


def _masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median over masked entries (torch.median parity: lower of the two
    middle values for even counts).

    Radix selection instead of jnp.sort: the eval path pays this per
    frame (GT + pred medians for GT-scale), and a 0.49M-element TPU sort
    costs several ms where the exact k-th order statistic needs only
    width/4 compare+reduce passes (ops/topk.py). Masked-out entries sit
    at +inf, so the lower-middle of the valid values is the
    (N - idx)-th largest of the masked array — bit-identical to
    sorted[idx]. Depth values are non-negative (kth_largest's domain)."""
    from codeps_tpu.ops.topk import kth_largest
    big = jnp.where(mask, values, jnp.inf)
    count = jnp.sum(mask)
    idx = jnp.maximum((count - 1) // 2, 0)      # 0-based ascending
    return kth_largest(big, big.shape[0] - idx)


def _depth_stats(gt: jnp.ndarray, pred: jnp.ndarray,
                 masked_mean) -> Dict[str, jnp.ndarray]:
    """The 7 Monodepth2 stat formulas (eval/depth.py:109-131), shared by
    the batch and per-class variants so a formula fix lands once."""
    thresh = jnp.maximum(gt / pred, pred / gt)
    return {
        "a1": masked_mean((thresh < 1.25).astype(jnp.float32)),
        "a2": masked_mean((thresh < 1.25 ** 2).astype(jnp.float32)),
        "a3": masked_mean((thresh < 1.25 ** 3).astype(jnp.float32)),
        "rmse": jnp.sqrt(masked_mean((gt - pred) ** 2)),
        "rmse_log": jnp.sqrt(masked_mean(
            (jnp.log(gt) - jnp.log(pred)) ** 2)),
        "abs_rel": masked_mean(jnp.abs(gt - pred) / gt),
        "sq_rel": masked_mean((gt - pred) ** 2 / gt),
    }


def compute_depth_metrics(depth_gt: jnp.ndarray, depth_pred: jnp.ndarray,
                          use_gt_scale: bool = True,
                          depth_ranges: Tuple[float, float] = (0.1, 80.0),
                          use_garg_crop: bool = False) -> Dict[str, jnp.ndarray]:
    """Compute depth stats averaged over the batch.

    Args:
      depth_gt: (B, H, W) or (B, H, W, 1); 0 marks void.
      depth_pred: (B, H, W, 1) or same as gt.

    Returns:
      dict of scalar metrics (keys METRIC_KEYS).
    """
    if depth_gt.ndim == 4:
        depth_gt = depth_gt[..., 0]
    if depth_pred.ndim == 4:
        depth_pred = depth_pred[..., 0]
    min_depth, max_depth = depth_ranges
    batch = depth_gt.shape[0]

    mask = depth_gt > 0
    if use_garg_crop:
        _, gh, gw = depth_gt.shape
        crop = jnp.zeros_like(mask)
        crop = crop.at[:, int(0.4080 * gh):int(0.9891 * gh),
                       int(0.0354 * gw):int(0.9638 * gw)].set(True)
        mask = mask & crop

    gt_flat = depth_gt.reshape(batch, -1)
    pred_flat = depth_pred.reshape(batch, -1)
    mask_flat = mask.reshape(batch, -1)
    count = jnp.maximum(jnp.sum(mask_flat, axis=1), 1)

    if use_gt_scale:
        med_gt = jnp.stack([_masked_median(gt_flat[b], mask_flat[b])
                            for b in range(batch)])
        med_pred = jnp.stack([_masked_median(pred_flat[b], mask_flat[b])
                              for b in range(batch)])
        ratio = med_gt / med_pred
        pred_flat = pred_flat * ratio[:, None]

    gt = jnp.clip(gt_flat, min_depth, max_depth)
    pred = jnp.clip(pred_flat, min_depth, max_depth)

    def masked_mean(x):
        return jnp.sum(jnp.where(mask_flat, x, 0.0), axis=1) / count

    stats = _depth_stats(gt, pred, masked_mean)
    # Average only over frames that have ANY valid GT: a frame with no
    # GT depth would otherwise contribute exactly 0 to every metric and
    # silently dilute the batch mean (the torch reference fails loudly
    # on an empty median instead). All-empty batches return NaN — the
    # same convention as the per-class variant; meter updates skip NaN.
    valid_frame = jnp.sum(mask_flat, axis=1) > 0
    n_valid = jnp.maximum(jnp.sum(valid_frame), 1)
    any_valid = jnp.any(valid_frame)
    nan = jnp.asarray(jnp.nan, jnp.float32)

    def batch_mean(value):
        mean = jnp.sum(jnp.where(valid_frame, value, 0.0)) / n_valid
        return jnp.where(any_valid, mean, nan)

    return {f"d_{key}": batch_mean(value) for key, value in stats.items()}


def compute_depth_metrics_per_class(depth_gt, depth_pred, semantic_gt,
                                    num_classes: int,
                                    use_gt_scale: bool = True,
                                    depth_ranges: Tuple[float, float]
                                    = (0.1, 80.0)) -> Dict[str, jnp.ndarray]:
    """Per-semantic-class depth stats: keys ``d_<metric>_c<class>``.

    Parity: DepthEvaluator.compute_depth_metrics_per_class
    (/root/reference/eval/depth.py:72-107): pixels of each class are
    pooled over the whole batch (no per-item split), void GT masked,
    optional GT-median scaling per class. Classes absent from the batch
    yield NaN entries (the reference simply omits them); callers should
    filter non-finite values.
    """
    if depth_gt.ndim == 4:
        depth_gt = depth_gt[..., 0]
    if depth_pred.ndim == 4:
        depth_pred = depth_pred[..., 0]
    min_depth, max_depth = depth_ranges

    gt_flat = depth_gt.reshape(-1)
    pred_flat = depth_pred.reshape(-1)
    sem_flat = semantic_gt.reshape(-1)

    stats: Dict[str, jnp.ndarray] = {}
    for cls in range(num_classes):
        mask = (sem_flat == cls) & (gt_flat > 0)
        count = jnp.sum(mask)
        safe_count = jnp.maximum(count, 1)

        pred_c = pred_flat
        if use_gt_scale:
            ratio = (_masked_median(gt_flat, mask)
                     / _masked_median(pred_flat, mask))
            pred_c = pred_flat * ratio

        gt_c = jnp.clip(gt_flat, min_depth, max_depth)
        pred_c = jnp.clip(pred_c, min_depth, max_depth)

        def masked_mean(x, mask=mask, safe_count=safe_count):
            return jnp.sum(jnp.where(mask, x, 0.0)) / safe_count

        nan = jnp.asarray(jnp.nan, jnp.float32)
        empty = count == 0
        cls_stats = _depth_stats(gt_c, pred_c, masked_mean)
        stats.update({f"d_{key}_c{cls}": jnp.where(empty, nan, value)
                      for key, value in cls_stats.items()})
    return stats
