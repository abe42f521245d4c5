"""Semantic segmentation metrics: confusion matrix + mIoU.

Parity: SemanticEvaluator (/root/reference/eval/semantic.py:8-65). The
confusion matrix builds on-device as a one-hot MXU contraction; the
cross-replica sum that the reference does with distributed.all_reduce
(eval/semantic.py:43-50) is a psum under jit or a host-side sum.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def compute_confusion_matrix(semantic_pred: jnp.ndarray,
                             semantic_gt: jnp.ndarray,
                             num_classes: int,
                             ignore_classes: Sequence[int] = (),
                             ignore_index: int = 255) -> jnp.ndarray:
    """(num_classes, num_classes) int32 confusion matrix, rows = GT.

    Pixels whose GT is ignore_index or in ignore_classes are dropped
    (eval/semantic.py:52-65).

    TPU scatters serialize per ROW (~7.5 ms per 1M rows on v5e), so the
    bincount-style scatter-add cost ~3.7 ms per 0.49M-pixel frame on the
    in-step eval path. The same contraction as a one-hot matmul rides
    the MXU instead: counts = gt_onehot^T @ (pred_onehot & valid) —
    bandwidth-bound, integer-exact (bf16 0/1 inputs, f32 accumulator,
    counts < 2^24). Same trick as the panoptic majority vote
    (ops/panoptic.py merge_semantic_and_instance).
    """
    pred = semantic_pred.reshape(-1).astype(jnp.int32)
    target = semantic_gt.reshape(-1).astype(jnp.int32)
    valid = target != ignore_index
    for cls in ignore_classes:
        valid = valid & (target != cls)
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    gt_oh = (target[:, None] == classes[None, :]) & valid[:, None]
    pred_oh = jnp.clip(pred, 0, num_classes - 1)[:, None] == classes[None, :]
    counts = jax.lax.dot_general(
        gt_oh.astype(jnp.bfloat16), pred_oh.astype(jnp.bfloat16),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return counts.astype(jnp.int32)


def compute_sem_miou(conf_mat, num_classes: int,
                     ignore_classes: Sequence[int] = (),
                     sum_pixels: bool = False):
    """mIoU from a confusion matrix.

    Parity: SemanticEvaluator.compute_sem_miou (eval/semantic.py:22-41):
    with ``sum_pixels`` the intersection/union sums are pixel-weighted into
    a single scalar; otherwise per-class IoUs are returned.
    """
    conf_mat = np.asarray(conf_mat, dtype=np.float64)
    keep = np.array([i for i in range(num_classes)
                     if i not in set(ignore_classes)])
    filtered = conf_mat[keep][:, keep]

    intersection = np.diag(filtered)
    union = filtered.sum(axis=1) + filtered.sum(axis=0) - intersection + 1e-8

    if sum_pixels:
        return intersection.sum() / union.sum()
    return intersection / union
