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
                   max_batches=None, offsets=(1,),
                   compute_loss: bool = False,
                   class_weights=None,
                   gen_visuals: bool = False,
                   label_mode: str = "codeps",
                   mesh=None) -> Dict[str, Any]:
    """Evaluate params over a loader; returns aggregate metrics.

    With ``mesh`` the batch axis is sharded over the device mesh (the
    reference validates on all ranks and all-reduces the meters,
    scripts/train_codeps.py:317-321 + eval/semantic.py:43-50); batches
    whose size does not divide the mesh (the drop_last=False tail)
    fall back to default placement. Metrics are identical either way —
    the per-batch reductions are batch-size-weighted sums.

    With ``compute_loss=True`` also reports the unweighted validation
    losses under ``val_loss_*`` keys plus ``val_loss`` (the weighted
    total), as validate(compute_loss=True) does
    (train_codeps.py:204-205,244-254). BN runs with running statistics
    (model.eval()).

    With ``gen_visuals=True`` the returned dict carries a
    ``visual_panels`` entry — colorized rgb/depth/semantic/panoptic
    panels of the first batch for wandb image logging
    (train_codeps.py:341-357).
    """
    eval_step = make_eval_step(modules, cfg, thing_list, ignore_classes)
    gt_panoptic = make_gt_panoptic_step(modules, thing_list)
    num_classes = modules.num_classes

    if mesh is not None:
        from codeps_tpu.parallel import (replicate, shard_batch,
                                         shard_batch_multihost)
        params = replicate(params, mesh)
        batch_stats = replicate(batch_stats, mesh)

    gather_for_host = None
    import jax
    if mesh is not None and jax.process_count() > 1:
        # Per-SAMPLE step outputs (panoptic maps, visuals' depth/center/
        # offset) come back batch-sharded; with >1 process each host
        # only addresses its own rows and np.asarray would raise.
        # Allgather them (jitted identity with replicated out-sharding)
        # before host-side PQ accumulation — the host-side equivalent of
        # the reference's all-rank eval + all_reduce of the meters
        # (scripts/train_codeps.py:317-321, eval/semantic.py:43-50).
        # Scalar/conf-matrix stats are full-batch reductions and come
        # back replicated already.
        from jax.sharding import NamedSharding, PartitionSpec
        gather_for_host = jax.jit(
            lambda tree: tree,
            out_shardings=NamedSharding(mesh, PartitionSpec()))

    def place(batch_np):
        arrs = {k: np.asarray(v) for k, v in batch_np.items()}
        leading = next(iter(arrs.values())).shape[0]
        if mesh is None:
            return {k: jnp.asarray(v) for k, v in arrs.items()}
        import jax
        num_processes = jax.process_count()
        if leading % mesh.devices.size == 0:
            if num_processes > 1:
                # The val loader is unsharded and deterministic
                # (scripts/train.py: shuffle=False), so every process
                # holds the full batch; each contributes its contiguous
                # per-host slice to the global array.
                per_host = leading // num_processes
                lo = jax.process_index() * per_host
                local = {k: v[lo:lo + per_host] for k, v in arrs.items()}
                return shard_batch_multihost(local, mesh)
            return shard_batch(arrs, mesh)
        if num_processes > 1:
            # drop_last=False tail that doesn't divide the mesh:
            # replicate the full batch over all devices (every process
            # supplies the identical full array).
            from jax.sharding import NamedSharding, PartitionSpec
            sharding = NamedSharding(mesh, PartitionSpec())
            return jax.tree.map(
                lambda x: jax.make_array_from_process_local_data(
                    sharding, x), arrs)
        return {k: jnp.asarray(v) for k, v in arrs.items()}

    loss_step = None
    if compute_loss:
        import jax

        from codeps_tpu.tasks.train import make_loss_fn
        if class_weights is None:
            class_weights = jnp.asarray(cfg.semantics.class_weights,
                                        jnp.float32)
        val_loss_fn = make_loss_fn(modules, cfg, class_weights, train=False)
        loss_step = jax.jit(
            lambda p, s, rng, b: val_loss_fn(p, s, rng, b)[:2])
        loss_rng = jax.random.PRNGKey(0)

    conf_total = np.zeros((num_classes, num_classes), np.int64)
    loss_sums: Dict[str, float] = {}
    loss_count = 0
    depth_sums: Dict[str, float] = {}
    depth_count = 0
    panoptic_eval = PanopticEvaluator(list(stuff_list), list(thing_list))
    first_visuals = None

    for batch_index, batch_np in enumerate(loader):
        if max_batches is not None and batch_index >= max_batches:
            break
        batch = place(batch_np)
        results, stats = eval_step(params, batch_stats, batch)
        if gather_for_host is not None:
            # Gather only what the host consumes: the panoptic map
            # every batch (PQ accumulation), and the FULL per-sample
            # tree (semantic_soft/depth/center/offset/...) only for the
            # one visuals batch — allgathering the whole tree per batch
            # would move full-resolution float maps across hosts just
            # to discard them.
            if gen_visuals and batch_index == 0:
                results = gather_for_host(results)
            elif "panoptic" in results:
                results = dict(results, panoptic=gather_for_host(
                    results["panoptic"]))

        if loss_step is not None:
            total, (losses, _, _) = loss_step(params, batch_stats,
                                              loss_rng, batch)
            loss_sums["val_loss"] = (loss_sums.get("val_loss", 0.0)
                                     + float(total))
            for key, value in losses.items():
                loss_sums[f"val_loss_{key}"] = \
                    loss_sums.get(f"val_loss_{key}", 0.0) + float(value)
            loss_count += 1

        if "sem_conf" in stats:
            conf_total += np.asarray(stats["sem_conf"], np.int64)
        for key, value in stats.items():
            if key.startswith("d_"):
                depth_sums[key] = depth_sums.get(key, 0.0) + float(value)
        if any(key.startswith("d_") for key in stats):
            depth_count += 1

        if gen_visuals and batch_index == 0:
            first_visuals = (batch_np,
                             {k: np.asarray(v) for k, v in results.items()
                              if hasattr(v, "shape")})

        if "panoptic" in results and "center" in batch_np:
            gt_sem = batch.get("semantic_eval", batch.get("semantic"))
            if gt_sem is not None:
                pan_gt = gt_panoptic(gt_sem, batch["center"],
                                     batch["offset"])
                if gather_for_host is not None:
                    pan_gt = gather_for_host(pan_gt)
                panoptic_eval.update(np.asarray(pan_gt),
                                     np.asarray(results["panoptic"]))

    metrics: Dict[str, Any] = {}
    if first_visuals is not None:
        from codeps_tpu.io.visualizations import gen_visualizations
        sample_np, results_np = first_visuals
        norm = cfg.dataset.normalization
        mean = norm.rgb_mean if norm.active else (0.0, 0.0, 0.0)
        std = norm.rgb_std if norm.active else (1.0, 1.0, 1.0)
        metrics["visual_panels"] = gen_visualizations(
            sample_np, results_np, mean, std,
            remove_classes=tuple(cfg.dataset.remove_classes),
            label_mode=label_mode)
    if loss_count:
        for key, value in loss_sums.items():
            metrics[key] = value / loss_count
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
