"""Jitted pretraining step.

Fuses the reference's train iteration — CodepsNet train forward
(codeps/online_adap.py:76-139) + weighted loss sum + backward + Adam step
(scripts/train_codeps.py:98-108) — into one jit-compiled function over a
TrainState.

SPMD: run under jax.jit with the batch sharded over the data axis of a
Mesh and params replicated; XLA inserts the gradient all-reduce (the DDP
allreduce of misc/train_utils.py:52) and computes BatchNorm train
statistics over the *global* batch (SyncBN parity, train_utils.py:50-51)
automatically from the sharding.

TPU-first deviation from the reference (documented, metric-level parity):
when the flow head is off, only frame t goes through the po_depth
backbone — the reference also encodes t-1/t+1 but never consumes those
features (codeps/online_adap.py:81-88 vs algos/depth.py:389-393), which
wastes 2 of 3 ResNet-101 passes per step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from codeps_tpu.evaluation.depth_metrics import compute_depth_metrics
from codeps_tpu.evaluation.semantic_metrics import compute_confusion_matrix
from codeps_tpu.losses import (binary_mask_loss, center_loss,
                               edge_aware_smoothness_loss,
                               flow_smoothness_loss, flow_sparsity_loss,
                               offset_loss, reconstruction_loss,
                               semantic_loss)
from codeps_tpu.models.codeps_net import CodepsModules
from codeps_tpu.tasks.forward import (apply_encoder, depth_forward,
                                      encode_frames)
from codeps_tpu.ops.normalize import maybe_normalize
from codeps_tpu.tasks.state import TrainState


def make_loss_fn(modules: CodepsModules, cfg, class_weights,
                 sem_ignore_classes=None, train: bool = True):
    """Build the pure loss function for pretraining.

    Args:
      class_weights: per-class semantic CE weights (already filtered for
        removed classes, model_setup.py:100-101).
      sem_ignore_classes: classes excluded from the semantic loss/argmax
        (SemKITTI adaptation-source case, semantic_seg.py:50-57,173-179).
      train: BN mode — False computes validation losses with running
        statistics (model.eval() in validate(), train_codeps.py:206).
    """
    weights = {k: v for k, v in cfg.losses.weights.items()}
    num_scales = cfg.depth.num_recon_scales
    top_k = cfg.semantics.top_k
    make_depth = modules.depth_head is not None
    make_flow = modules.flow_head is not None
    make_semantic = modules.semantic_head is not None
    make_instance = modules.instance_head is not None

    mean = tuple(cfg.dataset.normalization.rgb_mean)
    std = tuple(cfg.dataset.normalization.rgb_std)

    def loss_fn(params, batch_stats, rng, batch: Dict[str, Any]):
        losses: Dict[str, jnp.ndarray] = {}
        preds: Dict[str, Any] = {}
        new_stats = dict(batch_stats)
        # uint8-transfer path: normalize on device (no-op for floats)
        batch = dict(batch)
        if "frames" in batch:
            batch["frames"] = maybe_normalize(batch["frames"], mean, std)
        if "image" in batch:
            batch["image"] = maybe_normalize(batch["image"], mean, std)

        # ---------------- encoder over frames
        if make_depth and make_flow:
            frames = batch["frames"]  # (B, 3, H, W, 3): [t, t-1, t+1]
            per_frame_feats, enc_stats = encode_frames(
                modules, params, batch_stats, frames, train=train)
            feats_t = per_frame_feats[0]
            feats_neighbors = per_frame_feats[1:]
        else:
            center_img = (batch["frames"][:, 0] if "frames" in batch
                          else batch["image"])
            feats_t, enc_stats = apply_encoder(
                modules.backbone_po_depth, params["backbone_po_depth"],
                batch_stats["backbone_po_depth"], center_img, train=train)
            feats_neighbors = None
        new_stats["backbone_po_depth"] = enc_stats

        # ---------------- depth / pose / flow
        if make_depth:
            frames = batch["frames"]
            images = [frames[:, 0], frames[:, 1], frames[:, 2]]
            fwd = depth_forward(modules, params, batch_stats, images,
                                feats_t, train=train,
                                feats_neighbors=feats_neighbors)
            new_stats["backbone_pose_sflow"] = fwd["pose_batch_stats"]
            rng, sub = jax.random.split(rng)
            losses["depth_recon"] = reconstruction_loss(
                sub, batch["camera"], images, fwd["depth"],
                fwd["transformations"], fwd["object_motion_maps"],
                num_scales=num_scales,
                dtype=(jnp.bfloat16
                       if cfg.tpu.compute_dtype == "bfloat16"
                       else jnp.float32))
            losses["depth_smth"] = edge_aware_smoothness_loss(
                images[0], fwd["disparity"])
            if make_flow:
                losses["flow_smth"] = flow_smoothness_loss(
                    fwd["object_motion_maps"])
                losses["flow_sparsity"] = flow_sparsity_loss(
                    fwd["object_motion_maps"])
            preds["depth"] = fwd["depth"]
            preds["transformations"] = fwd["transformations"]

        # ---------------- semantics
        if make_semantic:
            # GUDA configs evaluate the head in block-phase space: the
            # per-pixel CE and argmax run on the 6-d view, so no
            # full-resolution 240-channel (or even 14-channel float)
            # activation is ever materialized; only the int32 label
            # maps get reshuffled (ops/guda_fusion.py).
            use_phase = modules.semantic_head.use_guda_fusion
            sem_probs = modules.semantic_head.apply(
                {"params": params["semantic_head"]}, feats_t,
                phase_space=use_phase)
            sem_gt = batch["semantic"]
            sem_weights = batch["semantic_weights"]
            if use_phase:
                from codeps_tpu.ops.guda_fusion import (depth_to_space,
                                                        space_to_depth)
                block = sem_gt.shape[1] // sem_probs.shape[1]
                sem_gt = space_to_depth(sem_gt, block)
                sem_weights = space_to_depth(sem_weights, block)
            losses["semantic"] = semantic_loss(
                sem_probs, sem_gt, sem_weights,
                class_weights=class_weights,
                ignore_labels=sem_ignore_classes,
                top_k_percent_pixels=top_k,
                dtype=(jnp.bfloat16
                       if cfg.tpu.compute_dtype == "bfloat16"
                       else jnp.float32))
            # argmax with ignored classes suppressed
            # (semantic_seg.py:173-179).
            masked = sem_probs
            if sem_ignore_classes:
                for cls in sem_ignore_classes:
                    masked = masked.at[..., cls].set(-jnp.inf)
            sem_pred = jnp.argmax(
                jax.lax.stop_gradient(masked), axis=-1).astype(jnp.int32)
            if use_phase:
                sem_pred = depth_to_space(sem_pred, block)
            else:
                preds["semantic_soft"] = sem_probs
            preds["semantic"] = sem_pred

        # ---------------- instances
        if make_instance:
            variables = {"params": params["instance_head"],
                         "batch_stats": batch_stats["instance_head"]}
            if train:
                (center_pred, offset_pred, thing_mask_probs), updates = \
                    modules.instance_head.apply(variables, feats_t,
                                                train=True,
                                                mutable=["batch_stats"])
                new_stats["instance_head"] = updates["batch_stats"]
            else:
                center_pred, offset_pred, thing_mask_probs = \
                    modules.instance_head.apply(variables, feats_t,
                                                train=False)
            losses["center"] = center_loss(center_pred, batch["center"],
                                           batch.get("center_weights"))
            losses["offset"] = offset_loss(offset_pred, batch["offset"],
                                           batch.get("offset_weights"))
            if thing_mask_probs is not None:
                losses["thing_mask"] = binary_mask_loss(
                    thing_mask_probs, batch["thing_mask"])
            preds["center"] = center_pred
            preds["offset"] = offset_pred
            preds["thing_mask"] = thing_mask_probs

        total = jnp.zeros((), jnp.float32)
        for key, value in losses.items():
            weight = weights.get(key)
            if weight is not None:
                total = total + weight * value

        return total, (losses, preds, new_stats)

    return loss_fn


def make_train_step(modules: CodepsModules, cfg, tx, class_weights,
                    sem_ignore_classes=None, num_classes: int | None = None,
                    eval_ignore_classes=(), donate: bool = True,
                    frozen_modules=()):
    """Build the jitted pretraining step.

    Returns fn(state, batch) -> (new_state, metrics) where metrics contains
    the unweighted loss dict, the total loss, the semantic confusion
    matrix, and depth stats when GT depth is in the batch (mirroring the
    stats surfaced by train_codeps.py:98-124).
    """
    loss_fn = make_loss_fn(modules, cfg, class_weights, sem_ignore_classes)
    num_classes = num_classes or modules.num_classes
    use_gt_scale = cfg.eval.depth.use_gt_scale
    depth_ranges = tuple(cfg.eval.depth.depth_ranges)

    frozen_modules = tuple(frozen_modules)

    def train_step(state: TrainState, batch):
        rng, sub = jax.random.split(state.rng)
        # Frozen modules enter the loss as constants: no backward is
        # built through them (requires_grad=False parity,
        # misc/train_utils.py:229-235); zeros only satisfy the optimizer
        # tree and fold away under XLA.
        trainable = {k: v for k, v in state.params.items()
                     if k not in frozen_modules}
        frozen = {k: v for k, v in state.params.items()
                  if k in frozen_modules}

        def loss_trainable(tp):
            return loss_fn({**tp, **frozen}, state.batch_stats, sub, batch)

        grad_fn = jax.value_and_grad(loss_trainable, has_aux=True)
        (total, (losses, preds, new_stats)), grads_live = grad_fn(trainable)
        grads = dict(grads_live)
        for name, tree in frozen.items():
            grads[name] = jax.tree.map(jnp.zeros_like, tree)

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {"loss_total": total, **losses}
        if "semantic" in preds and "semantic" in batch:
            gt_eval = batch.get("semantic_eval", batch["semantic"])
            metrics["sem_conf"] = compute_confusion_matrix(
                preds["semantic"], gt_eval, num_classes,
                eval_ignore_classes)
        if "depth" in preds and batch.get("depth_gt") is not None:
            metrics.update(compute_depth_metrics(
                batch["depth_gt"], jax.lax.stop_gradient(preds["depth"]),
                use_gt_scale=use_gt_scale, depth_ranges=depth_ranges))

        new_state = TrainState(
            params=new_params, batch_stats=new_stats,
            opt_state=new_opt_state, step=state.step + 1, rng=rng)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
