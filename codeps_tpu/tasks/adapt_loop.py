"""Host driver for the online-adaptation stream.

Parity: the adapt() loop of scripts/adapt_codeps.py:41-374 — per frame:
teacher eval + metrics (cumulative/interval mIoU, streaming PQ), mixup
pseudo-labeling + composition, nof_adaptation_steps jitted gradient steps
with in-jit EMA blend, then the diversity replay-buffer add.

The heavy work runs in three jitted programs (tasks/adapt.py); this
driver assembles static-shaped device batches from the ReplayBuffer's
per-frame sample dicts and keeps the metric meters.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from codeps_tpu.data.mixup import Mixup
from codeps_tpu.evaluation import (AverageMeter, ConfusionMatrixMeter,
                                   ConstantMeter, PanopticEvaluator,
                                   compute_sem_miou)
from codeps_tpu.tasks.adapt import (make_adapt_step, make_eval_step,
                                    make_gt_panoptic_step, make_plabel_step)
from codeps_tpu.tasks.state import AdaptState

MIXUP_KEYS = ("cut_mixup", "class_mixup", "conf_instance_mixup")


def _frames_from_sample(sample, offsets=(1,)) -> np.ndarray:
    """rgb dict {0,-1,1,...} -> (1, F, H, W, 3) [t, t-1, t+1, ...].

    uint8 frames stay uint8 (on-device normalization path)."""
    order = [0]
    for offset in offsets:
        order += [-offset, offset]
    stacked = np.stack([np.asarray(sample["rgb"][o]) for o in order])
    if stacked.dtype != np.uint8:
        stacked = stacked.astype(np.float32)
    return stacked[None]


class AdaptationRunner:

    def __init__(self, cfg, modules, state: AdaptState, tx, replay_buffer,
                 frozen_modules: List[str], label_mode: str = "codeps",
                 verbose: bool = True, wandb_logger=None):
        self.cfg = cfg
        self.modules = modules
        self.state = state
        self.tx = tx
        self.buffer = replay_buffer
        self.verbose = verbose
        self.label_mode = label_mode
        # Streaming observability (adapt_codeps.py:311-337): scalars +
        # depth-per-class series + image panels every log interval.
        self.wandb_logger = wandb_logger
        self.offsets = tuple(cfg.dataset.offsets)

        dataset = replay_buffer.target_data
        self.thing_list = tuple(dataset.thing_classes)
        self.stuff_list = tuple(dataset.stuff_classes)
        self.ignore_classes = tuple(dataset.ignore_classes)
        self.num_classes = dataset.num_classes

        # EMA module list (adapt_codeps.py:57-69)
        self.ema_modules: List[str] = []
        if cfg.adapt.mode != "off":
            if cfg.adapt.ema.depth:
                raise NotImplementedError(
                    "Consistency loss for depth is not implemented "
                    "(matches the reference, adapt_codeps.py:70-72)")
            if cfg.adapt.ema.semantic and cfg.adapt.model.semantic:
                self.ema_modules.append("semantic_head")
            if cfg.adapt.ema.instance and cfg.adapt.model.instance:
                self.ema_modules.append("instance_head")
        self.frozen_modules = list(frozen_modules)

        class_weights = [w for i, w in enumerate(cfg.semantics.class_weights)
                         if i not in cfg.dataset.remove_classes]

        do_class_wise = (cfg.model.make_depth and cfg.model.make_semantic)
        self.eval_step = make_eval_step(modules, cfg, self.thing_list,
                                        self.ignore_classes,
                                        class_wise_depth_stats=do_class_wise)
        self._norm_mean = tuple(cfg.dataset.normalization.rgb_mean)
        self._norm_std = tuple(cfg.dataset.normalization.rgb_std)
        self.plabel_step = make_plabel_step(modules, self._norm_mean,
                                            self._norm_std)
        from codeps_tpu.tasks.mixup_prep import make_plabel_prep_step
        source_size = tuple(cfg.adapt.source_dataset.feed_img_size)
        self.plabel_prep = make_plabel_prep_step(
            modules, self.thing_list, source_size,
            geom_augment=cfg.adapt.mixup.general.geom_augment,
            mean=self._norm_mean, std=self._norm_std)
        self._mixup_src_size = source_size
        self._prewarp_cache: Dict[Any, Any] = {}
        self.gt_panoptic = make_gt_panoptic_step(modules, self.thing_list)

        self.mixup_active = cfg.adapt.mixup.general.active
        num_mixup = (cfg.adapt.mixup.general.nof_samples
                     if self.mixup_active else 0)
        strategies = list(cfg.adapt.mixup.general.mixup_strategies)
        # Per-strategy sub-batches in canonical MIXUP_KEYS order: the
        # reference collates each strategy's items under one key
        # (train_utils.py:101-114) and computes ONE pooled CE per key;
        # the step receives samples sorted accordingly.
        mixup_groups = tuple(
            (name, strategies.count(name)) for name in MIXUP_KEYS
            if name in strategies) if num_mixup else ()
        # cut_mixup and class_mixup compose entirely inside the adapt
        # step (teacher pseudo-labels + c2c warp + mask composition),
        # eliminating all mixup host round-trips; only
        # conf_instance_mixup (sequential distance-transform paste,
        # mixup.py:541-658) falls back to the host path.
        self.fused_mixup = (self.mixup_active and num_mixup > 0
                            and all(s in ("cut_mixup", "class_mixup")
                                    for s in strategies))
        if (self.mixup_active and "cut_mixup" in strategies
                and not cfg.adapt.mixup.general.geom_augment
                and tuple(cfg.dataset.feed_img_size) != source_size):
            # Without the geometric warp nothing maps the target frame
            # into the source frame, and cut composition needs equal
            # shapes — the reference's cut_mixup has the same constraint
            # (its boolean-mask assignment, mixup.py:317-330, requires
            # matching cell pixel counts). Fail at build time instead of
            # a cryptic trace error inside the (fused or host) step.
            raise ValueError(
                "cut_mixup with geom_augment=false requires equal "
                f"target/source feed sizes, got "
                f"{tuple(cfg.dataset.feed_img_size)} vs {source_size}")
        # Teacher metrics-eval folded into the adapt executable: one
        # dispatch and one upload of the target frames per adaptation
        # step instead of two (the standalone eval_step remains for the
        # eval-only mode). Same math, same pre-update teacher params.
        from codeps_tpu.tasks.adapt import build_eval_forward
        eval_forward = build_eval_forward(
            modules, cfg, self.thing_list, self.ignore_classes,
            class_wise_depth_stats=do_class_wise)
        common = dict(
            modules=modules, cfg=cfg, tx=tx, class_weights=class_weights,
            ema_modules=self.ema_modules,
            frozen_modules=self.frozen_modules, num_mixup=num_mixup,
            mixup_groups=mixup_groups,
            fused_mixup=self.fused_mixup,
            sem_ignore_classes=list(self.ignore_classes) or None,
            eval_forward=eval_forward)
        self.adapt_step_with_replay = make_adapt_step(has_replay=True,
                                                      **common)
        self.adapt_step_no_replay = make_adapt_step(has_replay=False,
                                                    **common)
        # At nof_adaptation_steps>1 only the FIRST step evaluates the
        # teacher (the reference evaluates once per frame, before the
        # adaptation loop — adapt_codeps.py:166-191); later steps use
        # eval-free variants so no teacher forward is recomputed and
        # discarded. jit is lazy, so these compile only when used.
        common_noeval = dict(common, eval_forward=None)
        self.adapt_step_with_replay_noeval = make_adapt_step(
            has_replay=True, **common_noeval)
        self.adapt_step_no_replay_noeval = make_adapt_step(
            has_replay=False, **common_noeval)

        self.disable_adaptation = cfg.adapt.mode == "off"
        self.adaptation_steps = (0 if self.disable_adaptation
                                 else cfg.train.nof_adaptation_steps)
        # loss weighting happens inside the compiled step (make_adapt_step
        # reads cfg.losses.weights directly) — no host-side copy kept.

        # Spatial sharding (cfg.tpu.spatial_shard): partition each
        # frame's image tensors along H over all local devices — the
        # per-frame latency lever the reference's 1-GPU cap forecloses
        # (adapt_codeps.py:391). The jitted steps are unchanged; GSPMD
        # derives the partitioning from the input shardings
        # (parallel/spatial.py, equality-tested in test_adapt_step.py).
        self.spatial_mesh = None
        if getattr(cfg.tpu, "spatial_shard", False):
            import jax

            from codeps_tpu.parallel import make_mesh, replicate
            if len(jax.devices()) > 1:
                self.spatial_mesh = make_mesh(cfg.tpu.mesh.data_axis)
                self.state = replicate(self.state, self.spatial_mesh)

        self.panoptic_eval = PanopticEvaluator(list(self.stuff_list),
                                               list(self.thing_list))
        self.meters = self._make_meters()
        self.mixup_rng = np.random.default_rng(cfg.adapt.replay_sampler.seed)
        self.step_times: List[float] = []

    # ------------------------------------------------------------------

    def _make_meters(self):
        loss_names = ["loss", "depth_recon", "depth_smth", "flow_smth",
                      "flow_sparsity", "semantic_source",
                      "semantic_cut_mixup", "semantic_class_mixup",
                      "semantic_conf_instance_mixup",
                      "center_source", "offset_source", "thing_mask_source"]
        metric_names = ["d_abs_rel", "d_a1", "d_a2", "d_a3", "d_rmse",
                        "d_rmse_log", "d_sq_rel"]
        # class-wise depth meters (adapt_codeps.py:134-142)
        if self.cfg.model.make_depth and self.cfg.model.make_semantic:
            for i in range(self.num_classes):
                metric_names += [f"d_abs_rel_c{i}", f"d_a1_c{i}",
                                 f"d_a2_c{i}", f"d_a3_c{i}", f"d_rmse_c{i}",
                                 f"d_rmse_log_c{i}", f"d_sq_rel_c{i}"]
        meters = {
            "losses": {name: AverageMeter(()) for name in loss_names},
            "metrics": {name: AverageMeter(()) for name in metric_names},
        }
        meters["metrics"]["sem_conf"] = ConfusionMatrixMeter(
            self.num_classes)
        meters["metrics"]["sem_conf_interval"] = ConfusionMatrixMeter(
            self.num_classes)
        for name in ("sem_miou", "sem_miou_pixels", "sem_miou_interval",
                     "sem_miou_pixels_interval", "p_pq", "p_sq", "p_rq"):
            meters["metrics"][name] = ConstantMeter(())
        return meters

    # ------------------------------------------------------------------

    def _target_gt(self, sample) -> Dict[str, Any]:
        """GT-only subtree for the in-step teacher eval (no frame
        re-upload — the step reads frames from the adapt batch)."""
        target = sample["target"]
        gt: Dict[str, Any] = {}
        if "semantic" in target:
            gt["semantic"] = jnp.asarray(
                np.asarray(target["semantic"], np.int32)[None])
            if "semantic_eval" in target:
                gt["semantic_eval"] = jnp.asarray(
                    np.asarray(target["semantic_eval"], np.int32)[None])
        if "depth" in target:
            gt["depth_gt"] = jnp.asarray(
                np.asarray(target["depth"], np.float32)[None])
        return gt

    def _target_eval_batch(self, sample) -> Dict[str, Any]:
        batch = {
            "frames": jnp.asarray(_frames_from_sample(sample["target"],
                                                      self.offsets)),
            "camera": jnp.asarray(
                np.asarray(sample["target"]["camera_model"],
                           np.float32)[None]),
        }
        target = sample["target"]
        if "semantic" in target:
            batch["semantic"] = jnp.asarray(
                np.asarray(target["semantic"], np.int32)[None])
            if "semantic_eval" in target:
                batch["semantic_eval"] = jnp.asarray(
                    np.asarray(target["semantic_eval"], np.int32)[None])
        if "depth" in target:
            batch["depth_gt"] = jnp.asarray(
                np.asarray(target["depth"], np.float32)[None])
        return batch

    def _adapt_batch(self, sample, mixup_samples) -> Dict[str, Any]:
        def stack_domain(items, keys):
            domain = {"frames": jnp.asarray(np.concatenate(
                [_frames_from_sample(item, self.offsets)
                 for item in items]))}
            domain["camera"] = jnp.asarray(np.stack(
                [np.asarray(item["camera_model"], np.float32)
                 for item in items]))
            for key, dtype in keys:
                if key in items[0]:
                    domain[key] = jnp.asarray(np.stack(
                        [np.asarray(item[key]) for item in items]).astype(
                            dtype))
            return domain

        batch = {
            "target": {
                "frames": jnp.asarray(_frames_from_sample(
                    sample["target"], self.offsets)),
                "camera": jnp.asarray(np.asarray(
                    sample["target"]["camera_model"], np.float32)[None]),
            },
            "source": stack_domain(sample["source"], [
                ("semantic", np.int32), ("semantic_weights", np.float32),
                ("center", np.float32), ("offset", np.float32),
                ("thing_mask", np.int32),
            ]),
        }
        if "target_replay" in sample:
            batch["target_replay"] = stack_domain(sample["target_replay"],
                                                  [])
        def _stack_images(images):
            stacked = np.stack([np.asarray(im) for im in images])
            return (stacked if stacked.dtype == np.uint8
                    else stacked.astype(np.float32))

        fused_items = [(key, item) for key in ("cut_mixup", "class_mixup")
                       for item in sample.get(key, [])]
        if self.fused_mixup and fused_items:
            # canonical strategy order (matches the step's static
            # mixup_groups); per-strategy mask materials drawn with the
            # same host RNG stream as the unfused composition path
            items = [item for _, item in fused_items]
            cut_cfg = self.cfg.adapt.mixup.cut_mix
            nof_splits = cut_cfg.nof_vert_splits * cut_cfg.nof_hor_splits
            cut_cells = []
            class_replace = []
            for key, item in fused_items:
                if key == "cut_mixup":
                    cut_cells.append(self.mixup_rng.choice(
                        nof_splits, cut_cfg.nof_segments, replace=False))
                else:
                    # Mixup.class_mixup: replace a random half (rounded
                    # up) of the classes present in the SOURCE labels
                    sem_src = np.asarray(item["semantic_src"])
                    all_classes = np.unique(sem_src)
                    num = all_classes.shape[0]
                    chosen = all_classes[self.mixup_rng.choice(
                        num, (num + num % 2) // 2, replace=False)]
                    table = np.zeros((256,), bool)
                    table[chosen] = True
                    class_replace.append(table)
            batch["mixup"] = {
                "rgb_src": jnp.asarray(_stack_images(
                    [m["rgb_src"][0] for m in items])),
                "semantic_src": jnp.asarray(np.stack(
                    [np.asarray(m["semantic_src"]) for m in items]).astype(
                        np.int32)),
                "rgb_tgt": jnp.asarray(_stack_images(
                    [m["rgb_tgt"][0] for m in items])),
            }
            if self.cfg.adapt.mixup.general.geom_augment:
                rgb_tgt0 = np.asarray(items[0]["rgb_tgt"][0])
                batch["mixup"]["prewarp"] = self._c2c_prewarp_cached(
                    np.stack([np.asarray(m["camera_model_tgt"],
                                         np.float32) for m in items]),
                    np.stack([np.asarray(m["camera_model_src"],
                                         np.float32) for m in items]),
                    rgb_tgt0.shape[:2])
            if cut_cells:
                batch["mixup"]["cut_cells"] = jnp.asarray(
                    np.stack(cut_cells).astype(np.int32))
            if class_replace:
                batch["mixup"]["class_replace"] = jnp.asarray(
                    np.stack(class_replace))
        elif mixup_samples:
            # center/offset are omitted: no adaptation loss consumes
            # them (see Mixup.do_mixup note). Samples are already in
            # canonical strategy order (_compose_mixups iterates
            # MIXUP_KEYS), matching the step's static mixup_groups.
            batch["mixup"] = {
                "rgb": jnp.asarray(np.stack(
                    [np.asarray(m["rgb"][0], np.float32)
                     for m in mixup_samples])),
                "semantic": jnp.asarray(np.stack(
                    [np.asarray(m["semantic"], np.int32)
                     for m in mixup_samples])),
            }
        return batch

    def _place(self, batch, flat: bool = False):
        """Device placement hook: H-shard image tensors over the mesh in
        spatial mode (no-op single-device — jit places the arrays).
        ``flat`` marks single-domain batches (eval) whose image leaves
        sit at the top level."""
        if self.spatial_mesh is None:
            return batch
        from codeps_tpu.parallel import (shard_adapt_batch_hybrid,
                                         shard_adapt_batch_spatial)
        place = (shard_adapt_batch_spatial if flat
                 else shard_adapt_batch_hybrid)
        return place(batch, self.spatial_mesh,
                     self.cfg.tpu.mesh.data_axis)

    def _host_normalize(self, img) -> np.ndarray:
        """Host-side twin of maybe_normalize for mixup composition.

        The composed mixup images are float, so the jitted step's
        device-side maybe_normalize no-ops on them — under
        uint8_transfer the raw frames MUST be normalized here, or the
        composition would mix normalized teacher warps into raw 0-255
        source pixels (and train on garbage-scale images)."""
        img = np.asarray(img)
        if img.dtype != np.uint8:
            return img.astype(np.float32)
        mean = np.asarray(self._norm_mean, np.float32)
        std = np.asarray(self._norm_std, np.float32)
        return (img.astype(np.float32) / 255.0 - mean) / std

    def _c2c_prewarp_cached(self, intr_sampled, intr_out, sampled_size):
        """Device-resident c2c tap/weight pytree (tasks/mixup_prep.
        c2c_prewarp), cached by intrinsics: adaptation streams reuse a
        fixed camera pair, so the host float64 warp precomputation and
        its H2D upload happen once, not per frame."""
        key = (intr_sampled.tobytes(), intr_out.tobytes(),
               tuple(sampled_size))
        pre = self._prewarp_cache.get(key)
        if pre is None:
            from codeps_tpu.tasks.mixup_prep import c2c_prewarp
            pre = jax.tree.map(jnp.asarray, c2c_prewarp(
                intr_sampled, intr_out, tuple(sampled_size),
                self._mixup_src_size))
            if len(self._prewarp_cache) >= 8:
                self._prewarp_cache.clear()
            self._prewarp_cache[key] = pre
        return pre

    def _compose_mixups(self, sample) -> List[Dict[str, Any]]:
        """Mixup samples: one fused device program (pseudo-labels +
        panoptic fusion + geometric warp for the whole stack), then cheap
        numpy mask composition on host."""
        items = []
        for key in MIXUP_KEYS:
            for item in sample.get(key, []):
                items.append((key, item))
        if not items:
            return []

        cfg_mixup = self.cfg.adapt.mixup
        if not cfg_mixup.general.geom_augment:
            # Non-geometric path: per-item host composition (reference
            # resizes instead of warping; rare configuration).
            return self._compose_mixups_unfused(items)

        rgb_tgt = np.stack([np.asarray(item["rgb_tgt"][0])
                            for _, item in items])
        if rgb_tgt.dtype != np.uint8:
            rgb_tgt = rgb_tgt.astype(np.float32)
        intr_src = np.stack([np.asarray(item["camera_model_src"],
                                        np.float32) for _, item in items])
        intr_tgt = np.stack([np.asarray(item["camera_model_tgt"],
                                        np.float32) for _, item in items])
        rgb_w, sem_w, inst_w = self.plabel_prep(
            self.state.ema_params, self.state.ema_batch_stats,
            jnp.asarray(rgb_tgt),
            self._c2c_prewarp_cached(intr_tgt, intr_src,
                                     rgb_tgt.shape[1:3]))
        rgb_w = np.asarray(rgb_w)
        sem_w = np.asarray(sem_w)
        inst_w = np.asarray(inst_w)

        composed = []
        for i, (strategy, item) in enumerate(items):
            # rgb_w comes back NORMALIZED (plabel_prep normalizes uint8
            # on device); the source frame must match that scale.
            img_src = self._host_normalize(item["rgb_src"][0])
            semantic_src = np.asarray(item["semantic_src"])
            instance_src = np.asarray(item["instance_src"])
            if strategy == "cut_mixup":
                rgb, semantic, instance = Mixup.cut_mixup(
                    self.mixup_rng, img_src, rgb_w[i], instance_src,
                    semantic_src, sem_w[i], inst_w[i],
                    cfg_mixup.cut_mix.nof_vert_splits,
                    cfg_mixup.cut_mix.nof_hor_splits,
                    cfg_mixup.cut_mix.nof_segments)
            elif strategy == "class_mixup":
                rgb, semantic, instance = Mixup.class_mixup(
                    self.mixup_rng, img_src, rgb_w[i], instance_src,
                    semantic_src, sem_w[i], inst_w[i])
            else:  # conf_instance_mixup
                rgb, semantic, instance = Mixup.conf_instance_mixup(
                    img_src, rgb_w[i], instance_src, semantic_src,
                    sem_w[i], inst_w[i],
                    cfg_mixup.conf_instance_mix.min_inst_size,
                    thing_list=self.thing_list,
                    num_classes=self.num_classes,
                    conf_thresh=cfg_mixup.conf_instance_mix.conf_thresh)
            composed.append({
                "rgb": {0: rgb},
                "camera_model": item["camera_model_src"],
                "semantic": semantic,
                "instance": instance,
                "strategy": strategy,
            })
        return composed

    def _compose_mixups_unfused(self, items) -> List[Dict[str, Any]]:
        # Normalize on host ONCE (no-op for pre-normalized floats): the
        # same arrays feed the teacher pseudo-label pass and the host
        # composition, so both stay in normalized space — a raw-float
        # cast here would make the jitted step's uint8-only
        # maybe_normalize silently no-op on 0-255 images.
        rgb_tgt = np.stack([self._host_normalize(item["rgb_tgt"][0])
                            for _, item in items])
        sem, center, offset = self.plabel_step(
            self.state.ema_params, self.state.ema_batch_stats,
            jnp.asarray(rgb_tgt))
        sem = np.asarray(sem)
        center = np.asarray(center)
        offset = np.asarray(offset)

        composed = []
        for i, (strategy, item) in enumerate(items):
            data = dict(item)
            data["rgb_tgt"] = {0: rgb_tgt[i]}
            data["rgb_src"] = {0: self._host_normalize(item["rgb_src"][0])}
            data["semantic_pred_tgt_ema"] = sem[i]
            data["center_pred_tgt_ema"] = center[i]
            data["offset_pred_tgt_ema"] = offset[i]
            out = Mixup.do_mixup(strategy, data, self.thing_list,
                                 self.cfg.adapt.mixup, rng=self.mixup_rng,
                                 num_classes=self.num_classes,
                                 get_off_cen=False)
            out["strategy"] = strategy
            composed.append(out)
        return composed

    # ------------------------------------------------------------------

    def _dispatch_gt_panoptic(self, sample, eval_batch, results):
        """Enqueue the GT panoptic-fusion program for a frame right after
        that frame's own adapt steps, so it executes while the host preps
        the NEXT frame. Dispatching it lazily at consume time (the old
        behavior) enqueued it BEHIND the next frame's steps — its fetch
        then blocked on the whole next-frame device queue, serializing
        the stream."""
        if results is None or "panoptic" not in results:
            return None
        if "semantic" not in eval_batch:
            return None
        gt_sem = eval_batch.get("semantic_eval", eval_batch["semantic"])
        target = sample["target"]
        return self.gt_panoptic(
            gt_sem,
            jnp.asarray(np.asarray(target["center"], np.float32)[None]),
            jnp.asarray(np.asarray(target["offset"], np.float32)[None]))

    @staticmethod
    def _start_host_copies(*trees) -> None:
        """Begin device->host copies for every array a later consume()
        will fetch; np.asarray then reads local memory instead of paying
        a blocking relay round-trip per leaf. Backends without async
        copy support simply fetch at consume time (no-op fallback)."""
        for tree in trees:
            if tree is None:
                continue
            for leaf in jax.tree.leaves(tree):
                try:
                    leaf.copy_to_host_async()
                except AttributeError:
                    pass

    def _update_metrics(self, sample, eval_batch, results, stats,
                        pan_gt=None) -> None:
        metrics = self.meters["metrics"]
        for name, value in stats.items():
            if name in metrics and name != "sem_conf":
                value = np.asarray(value)
                if np.isnan(value).any():
                    continue  # class absent in this frame
                metrics[name].update(value)
        if "sem_conf" in stats:
            conf = np.asarray(stats["sem_conf"])
            metrics["sem_conf"].update(conf)
            metrics["sem_conf_interval"].update(conf)

            for prefix, meter_name in (("", "sem_conf"),
                                       ("_interval", "sem_conf_interval")):
                mat = metrics[meter_name].sum
                keep = [i for i in range(self.num_classes)
                        if i not in self.ignore_classes]
                per_class = compute_sem_miou(mat, self.num_classes,
                                             self.ignore_classes)
                filtered = np.asarray(mat)[keep][:, keep]
                has_gt = filtered.sum(axis=1) != 0
                miou = per_class[has_gt].mean() if has_gt.any() else 0.0
                metrics[f"sem_miou{prefix}"].update(miou)
                metrics[f"sem_miou_pixels{prefix}"].update(
                    compute_sem_miou(mat, self.num_classes,
                                     self.ignore_classes, sum_pixels=True))

        if "panoptic" in results and "semantic" in eval_batch:
            if pan_gt is None:
                pan_gt = self._dispatch_gt_panoptic(sample, eval_batch,
                                                    results)
            self.panoptic_eval.update(np.asarray(pan_gt),
                                      np.asarray(results["panoptic"]))
            scores = self.panoptic_eval.evaluate()
            metrics["p_pq"].update(scores["All"]["pq"])
            metrics["p_sq"].update(scores["All"]["sq"])
            metrics["p_rq"].update(scores["All"]["rq"])

    # ------------------------------------------------------------------

    def _log_wandb_interval(self, step: int, sample, results) -> None:
        """Stream scalars + per-class depth series + image panels of the
        latest teacher eval every log interval (adapt_codeps.py:311-337,
        io_utils/logging.py:186-212)."""
        logger = self.wandb_logger
        if logger is None or not getattr(logger, "enabled", False):
            return
        remove_classes = tuple(self.cfg.dataset.remove_classes)
        scalar_metrics = {
            name: float(m.value) for name, m in
            self.meters["metrics"].items() if np.ndim(m.value) == 0}
        logger.log_scalars(
            "adapt",
            losses={name: float(m.value) for name, m in
                    self.meters["losses"].items()},
            metrics=scalar_metrics, step=step)
        logger.log_depth_per_class(scalar_metrics, remove_classes,
                                   self.label_mode, step=step)
        if results:
            from codeps_tpu.io.visualizations import (gen_visualizations,
                                                      plot_confusion_matrix)
            vis_sample = {
                "frames": _frames_from_sample(sample["target"],
                                              self.offsets)}
            norm = self.cfg.dataset.normalization
            mean = norm.rgb_mean if norm.active else (0.0, 0.0, 0.0)
            std = norm.rgb_std if norm.active else (1.0, 1.0, 1.0)
            panels = gen_visualizations(
                vis_sample, {k: np.asarray(v) for k, v in results.items()
                             if v is not None and k != "semantic_soft"},
                mean, std, remove_classes=remove_classes,
                label_mode=self.label_mode)
            conf = self.meters["metrics"]["sem_conf"].sum
            if np.asarray(conf).sum() > 0:
                panels["conf_mat"] = plot_confusion_matrix(
                    np.asarray(conf), remove_classes, self.label_mode)
            logger.log_images("adapt/batch", panels, step=step)

    # ------------------------------------------------------------------

    def run(self, max_frames: Optional[int] = None,
            log_interval: Optional[int] = None) -> Dict[str, Any]:
        """Stream the adaptation split; returns the final meters."""
        log_interval = log_interval or self.cfg.logging.log_step_interval
        num_frames = len(self.buffer)
        if max_frames is not None:
            num_frames = min(num_frames, max_frames)

        # Async host feed: one frame of lookahead so file IO + LANCZOS +
        # augmentation overlap the device work (SURVEY §7 design move 5).
        # NOTE: replay/mixup sampling for frame it+1 happens before frame
        # it's buffer.add — the reference's multi-worker DataLoader with
        # prefetching has the same lag (workers assemble batches ahead of
        # the main process's add(), replay_buffer.py:51-57).
        import concurrent.futures
        executor = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        pending = executor.submit(self.buffer.__getitem__, 0)
        # Deferred buffer-add: the feature vector is fetched
        # asynchronously and added one frame later — consistent with the
        # existing prefetch ordering (the next frame's replay sampling
        # already precedes the current frame's add, see note above), and
        # it keeps the device->host copy off the frame's critical path.
        pending_add = None

        # Deferred metric consumption: the host-side processing of frame
        # it's outputs (meter fetches, GT-panoptic fusion + PQ update —
        # all of which force device->host syncs) happens AFTER frame
        # it+1's gradient steps have been dispatched, so the fetches
        # overlap the next frame's device work instead of serializing
        # the stream. The meter/PQ update ORDER is unchanged — only the
        # wall-clock moment they are read.
        pending_frame: Optional[Dict[str, Any]] = None

        def consume(ctx) -> None:
            self._update_metrics(ctx["sample"], ctx["eval_gt"],
                                 ctx["results"], ctx["stats"],
                                 pan_gt=ctx.get("pan_gt"))
            accum = ctx["accum"]
            nsteps = ctx["nsteps"]
            if accum is not None:
                # per-strategy mixup CE arrives as semantic_cut_mixup
                # etc. directly in the metrics dict (one pooled loss per
                # strategy, reference meter names, adapt_codeps.py:99)
                for name, value in accum.items():
                    if name in self.meters["losses"]:
                        self.meters["losses"][name].update(
                            np.asarray(value) / nsteps)
                self.meters["losses"]["loss"].update(
                    np.asarray(accum["loss_total"]) / nsteps)

            done = ctx["it"] + 1
            if done % log_interval == 0:
                if self.verbose:
                    from codeps_tpu.io.logging import log_iter
                    summary = {
                        "miou": self.meters["metrics"]["sem_miou"].value,
                        "pq": self.meters["metrics"]["p_pq"].value,
                        "loss": self.meters["losses"]["loss"].value,
                    }
                    recent = self.step_times[-log_interval:]
                    log_iter(
                        done, num_frames, summary, prefix="adapt",
                        elapsed=float(np.mean(recent)) if recent else 0.0)
                self._log_wandb_interval(done, ctx["sample"],
                                         ctx["results"])
                self.meters["metrics"]["sem_conf_interval"] = \
                    ConfusionMatrixMeter(self.num_classes)

        for it in range(num_frames):
            sample = pending.result()
            if it + 1 < num_frames:
                pending = executor.submit(self.buffer.__getitem__, it + 1)
            if "target" not in sample:
                continue
            start = time.time()

            if self.disable_adaptation:
                # eval-only mode: standalone teacher eval, consumed
                # immediately (no gradient stream to overlap with)
                eval_batch = self._place(self._target_eval_batch(sample),
                                         flat=True)
                results, stats = self.eval_step(self.state.ema_params,
                                                self.state.ema_batch_stats,
                                                eval_batch)
                consume({"sample": sample, "eval_gt": eval_batch,
                         "results": results, "stats": stats,
                         "accum": None, "nsteps": 1,
                         "mixup_samples": [], "it": it})
            else:
                # 1. mixup pseudo-labels + composition (host path only;
                # the fused cut-mixup path composes inside the step)
                mixup_samples = []
                if self.mixup_active and not self.fused_mixup:
                    mixup_samples = self._compose_mixups(sample)

                # 2. jitted gradient steps; the first one also evaluates
                # the pre-update EMA teacher on the incoming frame
                # (in-executable metrics eval — adapt_codeps.py:167-186
                # runs this as a separate pass)
                batch = self._adapt_batch(sample, mixup_samples)
                eval_gt = self._target_gt(sample)
                batch["eval_gt"] = eval_gt
                batch = self._place(batch)
                with_replay = "target_replay" in batch
                features = None
                results = stats = None
                accum: Optional[Dict[str, Any]] = None
                nsteps = self.adaptation_steps
                for step_i in range(nsteps):
                    # EMA blends ONCE per frame, after the N-step loop
                    # (adapt_codeps.py:294-299): a traced flag keeps the
                    # teacher untouched on all but the last step.
                    batch["do_ema"] = np.asarray(step_i == nsteps - 1)
                    if step_i == 0:
                        step_fn = (self.adapt_step_with_replay if with_replay
                                   else self.adapt_step_no_replay)
                        (self.state, metrics, features,
                         results, stats) = step_fn(self.state, batch)
                    else:
                        step_fn = (self.adapt_step_with_replay_noeval
                                   if with_replay
                                   else self.adapt_step_no_replay_noeval)
                        self.state, metrics, features = step_fn(self.state,
                                                                batch)
                    # accumulate per-step losses lazily on device; meters
                    # take the mean over the N steps like the reference
                    # (step_losses sum / adapation_steps,
                    # adapt_codeps.py:266-303)
                    if accum is None:
                        accum = {k: v for k, v in metrics.items()
                                 if k != "target_skipped"}
                    else:
                        accum = {k: accum[k] + metrics[k] for k in accum}

                # 3. enqueue THIS frame's GT panoptic fusion behind its
                # own steps and start device->host copies of everything
                # next frame's consume() will read, then consume the
                # PREVIOUS frame's metrics while this frame's steps run
                pan_gt = self._dispatch_gt_panoptic(sample, eval_gt,
                                                    results)
                self._start_host_copies(stats, accum, pan_gt,
                                        None if results is None else
                                        results.get("panoptic"))
                if pending_frame is not None:
                    consume(pending_frame)
                pending_frame = {"sample": sample, "eval_gt": eval_gt,
                                 "results": results, "stats": stats,
                                 "accum": accum, "nsteps": nsteps,
                                 "pan_gt": pan_gt,
                                 "mixup_samples": mixup_samples, "it": it}

                # 4. replay buffer diversity add (previous frame's
                # vector; this frame's copy starts now, asynchronously)
                if pending_add is not None:
                    self.buffer.add(pending_add[0],
                                    np.asarray(pending_add[1]))
                    pending_add = None
                if features is not None:
                    try:
                        features.copy_to_host_async()
                    except AttributeError:
                        pass
                    pending_add = (sample["index"], features)

            self.step_times.append(time.time() - start)

        if pending_frame is not None:
            consume(pending_frame)
        if pending_add is not None:
            self.buffer.add(pending_add[0], np.asarray(pending_add[1]))
        executor.shutdown(wait=False, cancel_futures=True)
        return self.meters
