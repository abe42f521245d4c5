#!/usr/bin/env python3
"""Pretraining CLI (parity: /root/reference/scripts/train_codeps.py).

Supervised panoptic + self-supervised depth pretraining on a source
dataset, SPMD data-parallel over all local devices.

Example:
  python scripts/train.py --run_name r1 \
      --filename_config cfg/train_cityscapes.yaml
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="CoDEPS-TPU pretraining")
    parser.add_argument("--run_name", required=True)
    parser.add_argument("--filename_config", required=True,
                        help="Path to the YAML config (reference cfg/*.yaml)")
    parser.add_argument("--comment", default="")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--checkpoint", default=None,
                        help="Resume from this checkpoint")
    parser.add_argument("--pre_train_checkpoint", nargs="*", default=[],
                        help="Pretrained weights, 'module:path' syntax "
                             "supported (io_utils.py:52-73); .pth files "
                             "are converted on the fly")
    parser.add_argument("--eval", action="store_true",
                        help="Validate the checkpoint once and exit "
                             "(train_codeps.py:32-33,483-495)")
    parser.add_argument("--freeze_modules", nargs="+", default=[],
                        help="Module-name prefixes to freeze during "
                             "training (train_codeps.py:43-44; prefix "
                             "semantics of train_utils.py:229-235)")
    parser.add_argument("--mode", default="train")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="Stop after N optimizer steps (smoke runs)")
    parser.add_argument("--experiments_dir", default="experiments")
    parser.add_argument("--wandb", action="store_true",
                        help="Enable wandb logging (if installed)")
    parser.add_argument("--wandb_project", default="codeps_tpu")
    parser.add_argument("--wandb_entity", default=None)
    return parser.parse_args()


def build_dataset(cfg, split, return_depth):
    from codeps_tpu.data import Cityscapes, Kitti360, SemKittiDvps
    name = cfg.dataset.name
    label_mode = cfg.dataset.label_mode
    if name == "cityscapes":
        return Cityscapes(split, cfg.dataset, return_depth=return_depth,
                          return_only_rgb=cfg.dataset.return_only_rgb,
                          label_mode=label_mode)
    if name == "kitti_360":
        return Kitti360(split, cfg.dataset, return_depth=return_depth,
                        return_only_rgb=cfg.dataset.return_only_rgb,
                        label_mode=label_mode)
    if name == "sem_kitti_dvps":
        return SemKittiDvps(split, cfg.dataset, return_depth=return_depth,
                            label_mode=label_mode)
    raise NotImplementedError(f"Dataset {name} is not implemented")


def main():
    args = parse_args()
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    from codeps_tpu.config import gen_config
    from codeps_tpu.data import DataLoader
    from codeps_tpu.io import (init_logging, log_info, log_iter,
                               pretrained_from_checkpoints,
                               restore_meters, restore_opt_state,
                               restore_rng, resume_from_checkpoint,
                               load_checkpoint, save_checkpoint)
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.parallel import (make_mesh, replicate, shard_batch,
                                     shard_batch_multihost)
    from codeps_tpu.tasks import (TrainState, build_optimizer,
                                  build_schedule, make_train_step)

    cfg = gen_config(args.filename_config)

    # Multi-host SPMD: initialize the distributed runtime when launched
    # under a multi-process coordinator (jax.distributed reads the
    # standard env vars); single-host runs skip this. Must run before
    # any run-dir/log/wandb side effects so those can be gated to the
    # lead process (the reference gates them to rank 0,
    # misc/train_utils.py:62-78 + scripts/train_codeps.py checkpoints).
    import os as _os
    if _os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            _os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
    is_lead = jax.process_index() == 0

    run_dir = Path(args.experiments_dir) / f"train_{args.run_name}"
    if is_lead:
        run_dir.mkdir(parents=True, exist_ok=True)
        (run_dir / "config.yaml").write_text(cfg.dump())
    # Followers log to console only: a shared run.log file handle across
    # processes would interleave corrupt lines.
    init_logging(str(run_dir / "logs") if is_lead else None,
                 debug=args.debug)
    from codeps_tpu.io.logging import WandbLogger
    wandb_logger = WandbLogger(project=args.wandb_project,
                               entity=args.wandb_entity,
                               run_name=args.run_name,
                               enabled=args.wandb and is_lead,
                               config=cfg.to_dict())
    log_info("Devices: %s (process %d/%d)", jax.devices(),
             jax.process_index(), jax.process_count())
    mesh = make_mesh(cfg.tpu.mesh.data_axis)
    num_devices = mesh.devices.size

    train_dataset = build_dataset(cfg, cfg.dataset.train_split,
                                  return_depth=False)
    val_dataset = build_dataset(cfg, cfg.dataset.val_split,
                                return_depth=cfg.model.make_depth)
    log_info("Train samples: %d | Val samples: %d", len(train_dataset),
             len(val_dataset))

    global_batch = cfg.train.batch_size_per_gpu * num_devices
    train_loader = DataLoader(train_dataset, global_batch,
                              cfg.dataset.offsets, shuffle=True,
                              seed=args.seed,
                              shard_index=jax.process_index(),
                              num_shards=jax.process_count(),
                              num_workers=cfg.train.nof_workers_per_gpu)
    # Validation shards the batch axis over the mesh (the reference
    # validates on all ranks with all-reduced meters,
    # train_codeps.py:317-321); drop_last=False keeps the tail batch,
    # which run_validation places unsharded when it doesn't divide.
    val_loader = DataLoader(val_dataset,
                            cfg.val.batch_size_per_gpu * num_devices,
                            cfg.dataset.offsets, shuffle=False,
                            drop_last=False)

    num_classes = train_dataset.num_classes
    compute_dtype = (jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16"
                     else jnp.float32)
    modules = build_modules(cfg, num_classes, dtype=compute_dtype)
    params, batch_stats = init_params(jax.random.PRNGKey(args.seed),
                                      modules,
                                      tuple(cfg.dataset.feed_img_size))

    if args.pre_train_checkpoint:
        params, batch_stats = pretrained_from_checkpoints(
            args.pre_train_checkpoint, params, batch_stats, cfg)

    steps_per_epoch = max(len(train_loader), 1)
    schedule = build_schedule(cfg, steps_per_epoch)
    # Prefix-match like the reference (train_utils.py:229-235 freezes
    # every param whose name starts with the given module string).
    frozen = [m for m in params
              if any(m.startswith(f) for f in args.freeze_modules)]
    if frozen:
        log_info("Frozen modules: %s", frozen)
    tx = build_optimizer(cfg, schedule, frozen_modules=frozen)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(args.seed))

    # Train loss meters (reference: adapt/train meters checkpointed and
    # restored, scripts/train_codeps.py:537-543). Updated at the log
    # cadence — per-step host fetches would stall the async dispatch
    # pipeline on a remote-relay TPU.
    from codeps_tpu.evaluation import AverageMeter
    train_meters = {}

    start_epoch = 0
    global_step = 0
    if args.checkpoint:
        checkpoint = load_checkpoint(args.checkpoint)
        params, batch_stats = resume_from_checkpoint(
            checkpoint, state.params, state.batch_stats)
        # full training-state round-trip: optimizer moments + schedule
        # counts, step RNG, global_step, meters (the reference restores
        # optimizer/scheduler/RNG/meters/epoch —
        # io_utils/io_utils.py:76-88, scripts/train_codeps.py:502-543).
        # --eval needs params/stats only (and the checkpoint's optimizer
        # tree shape depends on its run's freeze flags).
        opt_state = (None if args.eval
                     else restore_opt_state(checkpoint, state.opt_state))
        rng = restore_rng(checkpoint)
        global_step = int(checkpoint["training_meta"].get(
            "global_step", 0))
        state = state.replace(
            params=params, batch_stats=batch_stats,
            opt_state=opt_state if opt_state is not None
            else state.opt_state,
            rng=jnp.asarray(rng) if rng is not None else state.rng,
            step=jnp.asarray(global_step, jnp.int32))
        saved_meters = (checkpoint["state_dict"].get("meters") or {})
        train_meters = {name: AverageMeter(()) for name in saved_meters}
        restore_meters(checkpoint, train_meters)
        start_epoch = int(checkpoint["training_meta"]["epoch"]) + 1
        log_info("Resumed from %s at epoch %d (global_step %d)",
                 args.checkpoint, start_epoch, global_step)

    class_weights = [w for i, w in enumerate(cfg.semantics.class_weights)
                     if i not in cfg.dataset.remove_classes]
    assert len(class_weights) == num_classes, (
        f"semantics.class_weights ({len(cfg.semantics.class_weights)} "
        f"entries, {len(class_weights)} after remove_classes) must match "
        f"the {num_classes} classes of label_mode="
        f"{cfg.dataset.label_mode!r} — set it in the YAML like "
        "cfg/train_cityscapes.yaml does (a broadcast error deep inside "
        "the jitted loss otherwise)")
    # frozen_modules restricts autodiff to live modules (the optimizer
    # mask alone would still pay the full frozen backward); the ignore
    # classes keep train-time CE/argmax + sem_conf consistent with
    # run_validation's exclusions.
    ignore_classes = list(train_dataset.ignore_classes)
    train_step = make_train_step(modules, cfg, tx, class_weights,
                                 num_classes=num_classes,
                                 sem_ignore_classes=ignore_classes or None,
                                 eval_ignore_classes=ignore_classes,
                                 frozen_modules=frozen)

    state = replicate(state, mesh)

    if args.eval:
        # Validation-only mode (train_codeps.py:483-495: --eval requires
        # --resume and runs validate() once).
        assert args.checkpoint, "--checkpoint is needed in --eval mode"
        from codeps_tpu.tasks.validate import run_validation
        metrics = run_validation(
            cfg, modules, state.params, state.batch_stats, val_loader,
            train_dataset.thing_classes, train_dataset.stuff_classes,
            train_dataset.ignore_classes, compute_loss=True,
            class_weights=jnp.asarray(class_weights, jnp.float32),
            gen_visuals=wandb_logger.enabled,
            label_mode=cfg.dataset.label_mode, mesh=mesh)
        log_info("Eval: %s",
                 {k: round(float(v), 4) for k, v in metrics.items()
                  if np.ndim(v) == 0})
        wandb_logger.log_scalars("val", metrics={
            k: v for k, v in metrics.items() if np.ndim(v) == 0},
            step=global_step)
        if "visual_panels" in metrics:
            wandb_logger.log_images("val", metrics["visual_panels"],
                                    step=global_step)
        wandb_logger.finish()
        log_info("End of training script!")
        return

    for epoch in range(start_epoch, cfg.train.nof_epochs):
        train_loader.set_epoch(epoch)
        epoch_start = time.time()
        for batch_np in train_loader:
            # multi-process SPMD assembles the global batch from each
            # host's local shard; single-host takes the device_put path
            if jax.process_count() > 1:
                batch = shard_batch_multihost(batch_np, mesh)
            else:
                batch = shard_batch(batch_np, mesh)
            state, metrics = train_step(state, batch)
            global_step += 1
            if global_step % cfg.logging.log_step_interval == 0:
                host_metrics = {k: float(v) for k, v in metrics.items()
                                if np.ndim(v) == 0}
                for name, value in host_metrics.items():
                    if name not in train_meters:
                        train_meters[name] = AverageMeter(())
                    train_meters[name].update(value)
                log_iter(global_step,
                         cfg.train.nof_epochs * steps_per_epoch,
                         host_metrics, prefix=f"train e{epoch}")
                wandb_logger.log_scalars("train", losses=host_metrics,
                                         step=global_step)
            if args.max_steps and global_step >= args.max_steps:
                break

        log_info("Epoch %d done in %.1fs", epoch,
                 time.time() - epoch_start)
        # Collective under Orbax: every process must enter (barriers
        # inside; the primary host does the writing, the pickle
        # fallback is lead-gated inside save_checkpoint).
        save_checkpoint(
            str(run_dir / "saved_models" / f"epoch_{epoch}"), cfg,
            epoch, global_step, jax.device_get(state.params),
            jax.device_get(state.batch_stats),
            opt_state=jax.device_get(state.opt_state),
            rng=jax.device_get(state.rng), meters=train_meters)

        if (len(val_dataset) > 0
                and (epoch + 1) % cfg.logging.val_epoch_interval == 0):
            from codeps_tpu.tasks.validate import run_validation
            metrics = run_validation(
                cfg, modules, state.params, state.batch_stats, val_loader,
                train_dataset.thing_classes, train_dataset.stuff_classes,
                train_dataset.ignore_classes, compute_loss=True,
                class_weights=jnp.asarray(class_weights, jnp.float32),
                gen_visuals=wandb_logger.enabled,
                label_mode=cfg.dataset.label_mode, mesh=mesh)
            log_info("Val epoch %d: %s", epoch,
                     {k: round(float(v), 4) for k, v in metrics.items()
                      if np.ndim(v) == 0})
            wandb_logger.log_scalars("val", metrics={
                k: v for k, v in metrics.items() if np.ndim(v) == 0},
                step=global_step)
            if "visual_panels" in metrics:
                wandb_logger.log_images("val", metrics["visual_panels"],
                                        step=global_step)

        if args.max_steps and global_step >= args.max_steps:
            break

    wandb_logger.finish()
    log_info("End of training script!")


if __name__ == "__main__":
    main()
