#!/usr/bin/env python3
"""Online-adaptation CLI (parity: /root/reference/scripts/adapt_codeps.py).

Streams a target sequence frame by frame, adapting the pretrained model
online with source replay + mixup, then validates on the held-out target
split and on the source dataset (forgetting eval).

Example:
  python scripts/adapt.py --run_name a1 \
      --filename_config cfg/adapt_cityscapes_kitti_360.yaml \
      --checkpoint /path/to/pretrain_ckpt
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="CoDEPS-TPU adaptation")
    parser.add_argument("--run_name", required=True)
    parser.add_argument("--filename_config", required=True)
    parser.add_argument("--comment", default="")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--checkpoint", default=None,
                        help="Pretraining checkpoint (native dir or "
                             "reference .pth)")
    parser.add_argument("--mode", default="adapt")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--buffer_state", default=None,
                        help="Previous-domain buffer state for continual "
                             "chains (replay_buffer save_state)")
    parser.add_argument("--save_buffer_state", default=None)
    parser.add_argument("--experiments_dir", default="experiments")
    parser.add_argument("--wandb", action="store_true",
                        help="Enable wandb logging (if installed)")
    parser.add_argument("--wandb_project", default="codeps_tpu")
    parser.add_argument("--wandb_entity", default=None)
    return parser.parse_args()


def main():
    args = parse_args()
    np.random.seed(args.seed)

    import jax
    import jax.numpy as jnp

    from codeps_tpu.config import gen_config
    from codeps_tpu.data import Cityscapes, Kitti360, SemKittiDvps
    from codeps_tpu.data.replay_buffer import ReplayBuffer
    from codeps_tpu.io import (init_logging, log_info,
                               pretrained_from_checkpoints)
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.tasks import build_optimizer, make_adapt_state
    from codeps_tpu.tasks.adapt_loop import AdaptationRunner

    cfg = gen_config(args.filename_config, adapt=True)
    if cfg.adapt.mode == "off":
        log_info("WARNING: disabled adaptation")

    run_dir = Path(args.experiments_dir) / f"adapt_{args.run_name}"
    run_dir.mkdir(parents=True, exist_ok=True)
    (run_dir / "config.yaml").write_text(cfg.dump())
    init_logging(str(run_dir / "logs"), debug=args.debug)
    from codeps_tpu.io.logging import WandbLogger
    wandb_logger = WandbLogger(project=args.wandb_project,
                               entity=args.wandb_entity,
                               run_name=args.run_name, enabled=args.wandb,
                               config=cfg.to_dict())

    # ---------------- datasets + replay buffer (misc/adapt_utils.py:11-56)
    if cfg.dataset.name == "sem_kitti_dvps":
        target_dataset = SemKittiDvps(
            "sequence", cfg.dataset, return_depth=True,
            sequences=list(cfg.dataset.sequences),
            label_mode=cfg.dataset.label_mode)
    elif cfg.dataset.name == "kitti_360":
        target_dataset = Kitti360(
            "sequence", cfg.dataset, return_depth=True,
            sequences=list(cfg.dataset.sequences),
            sequence_reference_mode="rgb",
            label_mode=cfg.dataset.label_mode)
    else:
        raise NotImplementedError(
            f"Dataset {cfg.dataset.name} is not implemented")
    assert cfg.adapt.source_dataset.name == "cityscapes", \
        "Only Cityscapes is supported as the adaptation source"
    source_dataset = Cityscapes("train", cfg.adapt.source_dataset,
                                label_mode=cfg.dataset.label_mode)

    replay_buffer = ReplayBuffer(target_dataset, cfg.adapt, mode="train")
    replay_buffer.initialize_source_buffer(
        source_dataset, cfg.adapt.replay_buffer.source_size)
    if args.buffer_state:
        # The previous domain's dataset object travels inside the saved
        # state (it may be a DIFFERENT dataset type — a CS->K360->
        # SemKITTI chain crosses from Kitti360 to SemKittiDvps; the
        # reference pickles the dataset too, replay_buffer.py:472).
        replay_buffer.load_state(path=args.buffer_state)

    log_info("Adaptation frames: %d | Source buffer: %d",
             len(replay_buffer), len(replay_buffer.source_samples_indices))

    # ---------------- model
    num_classes = replay_buffer.num_classes
    compute_dtype = (jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16"
                     else jnp.float32)
    modules = build_modules(cfg, num_classes, dtype=compute_dtype)
    params, batch_stats = init_params(
        jax.random.PRNGKey(args.seed), modules,
        tuple(cfg.dataset.feed_img_size))
    if args.checkpoint:
        params, batch_stats = pretrained_from_checkpoints(
            [args.checkpoint], params, batch_stats, cfg)
        log_info("Loaded checkpoint %s", args.checkpoint)

    # Frozen modules from the adapt flags (adapt_codeps.py:426-435)
    frozen = []
    adapt_flags = cfg.adapt.model
    for module, flag in (("backbone_po_depth", adapt_flags.backbone_po_depth),
                         ("backbone_pose_sflow",
                          adapt_flags.backbone_pose_sflow),
                         ("depth_head", adapt_flags.depth),
                         ("pose_head", adapt_flags.pose),
                         ("flow_head", adapt_flags.sflow),
                         ("semantic_head", adapt_flags.semantic),
                         ("instance_head", adapt_flags.instance)):
        if not flag:
            frozen.append(module)
    frozen = [m for m in frozen if m in params]
    log_info("Frozen modules: %s", frozen)

    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    ema_modules = []
    if cfg.adapt.ema.semantic and cfg.adapt.model.semantic:
        ema_modules.append("semantic_head")
    if cfg.adapt.ema.instance and cfg.adapt.model.instance:
        ema_modules.append("instance_head")
    state = make_adapt_state(params, batch_stats, tx,
                             jax.random.PRNGKey(args.seed),
                             ema_modules=ema_modules,
                             frozen_modules=frozen,
                             ema_alpha=cfg.adapt.ema.alpha)

    runner = AdaptationRunner(cfg, modules, state, tx, replay_buffer,
                              frozen_modules=frozen,
                              label_mode=cfg.dataset.label_mode,
                              wandb_logger=wandb_logger)
    meters = runner.run(max_frames=args.max_frames)

    times = np.asarray(runner.step_times[3:] or runner.step_times)
    if len(times):
        log_info("Adaptation done: %.2f steps/s (mean over %d frames)",
                 1.0 / max(times.mean(), 1e-9), len(times))
    else:
        log_info("Adaptation done: 0 frames processed (empty stream?)")
    log_info("Final mIoU: %.4f | PQ: %.4f",
             float(meters["metrics"]["sem_miou"].value),
             float(meters["metrics"]["p_pq"].value))
    wandb_logger.log_scalars(
        "adapt",
        losses={k: m.value for k, m in meters["losses"].items()},
        metrics={k: m.value for k, m in meters["metrics"].items()
                 if np.ndim(m.value) == 0},
        step=len(runner.step_times))
    if runner.panoptic_eval.pq_stats.pq_per_cat:
        wandb_logger.log_panoptic_table(
            "adapt", runner.panoptic_eval.evaluate(),
            cfg.dataset.remove_classes, cfg.dataset.label_mode,
            step=len(runner.step_times))
    wandb_logger.log_depth_per_class(
        {k: m.value for k, m in meters["metrics"].items()
         if np.ndim(m.value) == 0},
        cfg.dataset.remove_classes, cfg.dataset.label_mode,
        step=len(runner.step_times))

    if args.save_buffer_state:
        replay_buffer.save_state(args.save_buffer_state)
        log_info("Saved buffer state to %s", args.save_buffer_state)

    # ---------------- held-out target validation + source forgetting eval
    # (adapt_codeps.py:449-458); the adapted EMA teacher is evaluated,
    # matching the reference's returned model.
    from codeps_tpu.data import DataLoader
    from codeps_tpu.tasks.validate import run_validation

    final_params = runner.state.ema_params
    final_stats = runner.state.ema_batch_stats

    if cfg.dataset.name == "sem_kitti_dvps":
        val_target = SemKittiDvps("sequence", cfg.dataset,
                                  return_depth=True,
                                  sequences=list(cfg.dataset.sequences),
                                  label_mode=cfg.dataset.label_mode)
    else:
        # sequence_reference_mode="semantic": the held-out val split
        # contains only annotated frames, and the ReplayBuffer split
        # index accounts for the skipped ones (misc/adapt_utils.py:69,
        # datasets/replay_buffer.py:32-39).
        val_target = Kitti360("sequence", cfg.dataset, return_depth=True,
                              sequences=list(cfg.dataset.sequences),
                              sequence_reference_mode="semantic",
                              label_mode=cfg.dataset.label_mode)
    val_buffer = ReplayBuffer(val_target, cfg.adapt, mode="val")
    if len(val_buffer) > 0:
        max_batches = (max(1, args.max_frames) if args.max_frames
                       else None)
        val_loader = DataLoader(val_buffer, batch_size=1,
                                offsets=cfg.dataset.offsets, shuffle=False,
                                num_threads=1)
        metrics = run_validation(cfg, modules, final_params, final_stats,
                                 val_loader, runner.thing_list,
                                 runner.stuff_list, runner.ignore_classes,
                                 max_batches=max_batches)
        log_info("Target val: %s",
                 {k: round(float(v), 4) for k, v in metrics.items()
                  if np.ndim(v) == 0})

    source_val = Cityscapes("val", cfg.adapt.source_dataset,
                            label_mode=cfg.dataset.label_mode)
    if len(source_val) > 0:
        max_batches = (max(1, args.max_frames) if args.max_frames
                       else None)
        source_loader = DataLoader(source_val, batch_size=1,
                                   offsets=cfg.adapt.source_dataset.offsets,
                                   shuffle=False, num_threads=1)
        metrics = run_validation(cfg, modules, final_params, final_stats,
                                 source_loader, runner.thing_list,
                                 runner.stuff_list, (),
                                 max_batches=max_batches)
        log_info("Source val (forgetting): %s",
                 {k: round(float(v), 4) for k, v in metrics.items()
                  if np.ndim(v) == 0})

    wandb_logger.finish()
    log_info("End of adaptation script!")


if __name__ == "__main__":
    main()
