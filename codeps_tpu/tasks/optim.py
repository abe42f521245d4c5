"""Optimizer / LR-schedule factories (optax).

Parity targets:
  - Adam optimizer factory (misc/train_utils.py:194-201)
  - StepLR + WarmupPolyLR schedules (misc/train_utils.py:204-226,
    misc/solver.py:9-70). The reference steps StepLR once per *epoch*;
    the optax schedule therefore takes steps_per_epoch.
  - Module freezing via an optax mask instead of requires_grad
    (misc/train_utils.py:229-235) — frozen modules get zero updates and
    no optimizer state, which also removes the need for DDP's
    find_unused_parameters.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import optax


def warmup_poly_schedule(base_lr: float, max_iters: int,
                         warmup_factor: float = 0.001,
                         warmup_iters: int = 1000,
                         warmup_method: str = "linear",
                         power: float = 0.9,
                         constant_ending: float = 0.0):
    """Panoptic-DeepLab poly schedule (misc/solver.py:9-70)."""

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            wf = jnp.where(count >= warmup_iters, 1.0, warmup_factor)
        elif warmup_method == "linear":
            alpha = count / warmup_iters
            wf = jnp.where(count >= warmup_iters, 1.0,
                           warmup_factor * (1.0 - alpha) + alpha)
        else:
            raise ValueError(f"Unknown warmup method: {warmup_method}")
        poly = jnp.power(jnp.maximum(1.0 - count / max_iters, 0.0), power)
        lr = base_lr * wf * poly
        if constant_ending > 0:
            lr = jnp.where((wf == 1.0) & (poly < constant_ending),
                           base_lr * constant_ending, lr)
        return lr

    return schedule


def step_lr_schedule(base_lr: float, step_size_epochs: int, gamma: float,
                     steps_per_epoch: int):
    """torch StepLR semantics with per-epoch decay boundaries."""

    def schedule(count):
        epoch = jnp.asarray(count, jnp.int32) // max(steps_per_epoch, 1)
        return base_lr * jnp.power(gamma, epoch // step_size_epochs)

    return schedule


def build_schedule(cfg, steps_per_epoch: int):
    sched_type = cfg.train.scheduler.type
    base_lr = cfg.train.optimizer.learning_rate
    if sched_type == "StepLR":
        return step_lr_schedule(base_lr, cfg.train.scheduler.step_lr.step_size,
                                cfg.train.scheduler.step_lr.gamma,
                                steps_per_epoch)
    if sched_type == "WarmupPolyLR":
        warm = cfg.train.scheduler.warmup
        return warmup_poly_schedule(base_lr, warm.max_iters, warm.factor,
                                    warm.iters, warm.method, warm.power,
                                    warm.constant_ending)
    if sched_type == "None":
        return base_lr
    raise NotImplementedError(f"Scheduler {sched_type} not implemented")


def build_optimizer(cfg, schedule, frozen_modules: Sequence[str] = ()):
    """Adam with optional per-module freezing.

    ``frozen_modules`` are top-level keys of the params dict (module names,
    matching the reference's name-prefix freezing).
    """
    if cfg.train.optimizer.type == "None":
        return optax.set_to_zero()
    if cfg.train.optimizer.type != "Adam":
        raise NotImplementedError(
            f"Optimizer {cfg.train.optimizer.type} not implemented")

    # torch Adam defaults: b1=0.9, b2=0.999, eps=1e-8.
    tx = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    if frozen_modules:
        frozen = set(frozen_modules)

        def label_tree(params):
            return {name: ("frozen" if name in frozen else "trained")
                    for name in params}

        tx = optax.multi_transform(
            {"trained": tx, "frozen": optax.set_to_zero()}, label_tree)
    return tx
