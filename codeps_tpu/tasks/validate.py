"""Validation over a dataset split.

Parity: validate() (scripts/train_codeps.py:204-415): per batch, predict
depth/semantic/center/offset, accumulate the confusion matrix and depth
stats, panoptic-fuse both predictions and GT (train_codeps.py:331-338),
and stream PQ. Cross-device metric reduction is implicit: the jitted step
sees the global batch (§2.8).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from codeps_tpu.evaluation import (PanopticEvaluator, compute_sem_miou)
from codeps_tpu.tasks.adapt import make_eval_step, make_gt_panoptic_step


def run_validation(cfg, modules, params, batch_stats, loader,
                   thing_list, stuff_list, ignore_classes=(),
                   max_batches=None, offsets=(1,)) -> Dict[str, Any]:
    """Evaluate params over a loader; returns aggregate metrics."""
    eval_step = make_eval_step(modules, cfg, thing_list, ignore_classes)
    gt_panoptic = make_gt_panoptic_step(modules, thing_list)
    num_classes = modules.num_classes

    conf_total = np.zeros((num_classes, num_classes), np.int64)
    depth_sums: Dict[str, float] = {}
    depth_count = 0
    panoptic_eval = PanopticEvaluator(list(stuff_list), list(thing_list))

    for batch_index, batch_np in enumerate(loader):
        if max_batches is not None and batch_index >= max_batches:
            break
        batch = {key: jnp.asarray(value) for key, value in batch_np.items()}
        results, stats = eval_step(params, batch_stats, batch)

        if "sem_conf" in stats:
            conf_total += np.asarray(stats["sem_conf"], np.int64)
        for key, value in stats.items():
            if key.startswith("d_"):
                depth_sums[key] = depth_sums.get(key, 0.0) + float(value)
        if any(key.startswith("d_") for key in stats):
            depth_count += 1

        if "panoptic" in results and "center" in batch_np:
            gt_sem = batch.get("semantic_eval", batch.get("semantic"))
            if gt_sem is not None:
                pan_gt = gt_panoptic(gt_sem, batch["center"],
                                     batch["offset"])
                panoptic_eval.update(np.asarray(pan_gt),
                                     np.asarray(results["panoptic"]))

    metrics: Dict[str, Any] = {}
    if conf_total.sum() > 0:
        per_class = compute_sem_miou(conf_total, num_classes,
                                     ignore_classes)
        keep = [i for i in range(num_classes) if i not in ignore_classes]
        has_gt = conf_total[keep][:, keep].sum(axis=1) != 0
        metrics["sem_miou"] = float(per_class[has_gt].mean()) \
            if has_gt.any() else 0.0
        metrics["sem_miou_pixels"] = float(compute_sem_miou(
            conf_total, num_classes, ignore_classes, sum_pixels=True))
        metrics["sem_conf"] = conf_total
    if depth_count:
        for key, value in depth_sums.items():
            metrics[key] = value / depth_count
    if panoptic_eval.pq_stats.pq_per_cat:
        scores = panoptic_eval.evaluate()
        for group in ("All", "Stuff", "Things"):
            prefix = {"All": "p", "Stuff": "p_stuff",
                      "Things": "p_things"}[group]
            for key in ("pq", "sq", "rq"):
                metrics[f"{prefix}_{key}"] = float(scores[group][key])
    return metrics
