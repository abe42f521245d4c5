#!/usr/bin/env python3
"""Benchmark: online-adaptation steps/sec on the real TPU chip.

North-star metric (BASELINE.json): adaptation train steps/sec (fwd+bwd)
at 384x1280 target resolution with the default CS->SemKITTI adaptation
shape: 1 target triplet + 2 source samples (512x1024) + 2 target replay
+ 2 mixup samples, ResNet-101 shared backbone + ResNet-18 pose backbone,
frozen backbone_po_depth/instance_head, bf16 conv compute.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the 25 steps/s v5e-8 target.

Smaller-footprint knobs for smoke runs:
  BENCH_PRESET=tiny    (64x128, ResNet-18)
  BENCH_STEPS=N        timed steps (default 20)
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_STEPS_PER_SEC = 25.0


def main():
    import jax
    import jax.numpy as jnp

    from codeps_tpu.config import gen_config
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.tasks import AdaptState, build_optimizer
    from codeps_tpu.tasks.adapt import DIST_BUFFER_LEN, make_adapt_step

    preset = os.environ.get("BENCH_PRESET", "full")
    if preset == "tiny":
        ht, wt = 64, 128
        hs, ws = 64, 96
        backbone = 18
    else:
        ht, wt = 384, 1280   # SemKITTI-DVPS adaptation resolution
        hs, ws = 512, 1024   # Cityscapes source resolution
        backbone = 101
    num_steps = int(os.environ.get("BENCH_STEPS", "20"))
    num_source, num_replay, num_mixup = 2, 2, 2
    num_classes = 14

    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = backbone
    cfg.semantics.class_weights = [1.0] * num_classes
    cfg.freeze()

    modules = build_modules(cfg, num_classes, dtype=jnp.bfloat16)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (ht, wt))

    frozen = ("backbone_po_depth", "instance_head")
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = AdaptState(
        params=params, batch_stats=stats,
        ema_params=jax.tree.map(lambda x: x, params),
        ema_batch_stats=stats, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(1),
        dist_buffer=jnp.zeros((DIST_BUFFER_LEN,), jnp.float32),
        dist_count=jnp.zeros((), jnp.int32),
        dist_head=jnp.zeros((), jnp.int32))

    step = make_adapt_step(
        modules, cfg, tx, class_weights=[1.0] * num_classes,
        ema_modules=("semantic_head",), frozen_modules=frozen,
        has_replay=True, num_mixup=num_mixup, donate=True)

    rng = np.random.default_rng(0)

    def frames(n, h, w):
        return jnp.asarray(rng.uniform(0, 1, (n, 3, h, w, 3)).astype(
            np.float32))

    batch = {
        "target": {
            "frames": frames(1, ht, wt),
            "camera": jnp.asarray([[720.0, 720.0, wt / 2, ht / 2]],
                                  jnp.float32),
        },
        "source": {
            "frames": frames(num_source, hs, ws),
            "camera": jnp.tile(jnp.asarray(
                [[600.0, 600.0, ws / 2, hs / 2]], jnp.float32),
                (num_source, 1)),
            "semantic": jnp.asarray(rng.integers(
                0, num_classes, (num_source, hs, ws)).astype(np.int32)),
            "semantic_weights": jnp.ones((num_source, hs, ws),
                                         jnp.float32),
            "center": jnp.asarray(rng.uniform(
                0, 1, (num_source, hs, ws, 1)).astype(np.float32)),
            "offset": jnp.asarray(rng.normal(
                0, 4, (num_source, hs, ws, 2)).astype(np.float32)),
        },
        "target_replay": {
            "frames": frames(num_replay, ht, wt),
            "camera": jnp.tile(jnp.asarray(
                [[720.0, 720.0, wt / 2, ht / 2]], jnp.float32),
                (num_replay, 1)),
        },
        "mixup": {
            "rgb": frames(num_mixup, hs, ws)[:, 0],
            "semantic": jnp.asarray(rng.integers(
                0, num_classes, (num_mixup, hs, ws)).astype(np.int32)),
            "center": jnp.asarray(rng.uniform(
                0, 1, (num_mixup, hs, ws, 1)).astype(np.float32)),
            "offset": jnp.asarray(rng.normal(
                0, 4, (num_mixup, hs, ws, 2)).astype(np.float32)),
            "loss_weight": jnp.asarray([1.0, 0.0], jnp.float32),
        },
    }

    # Warmup / compile
    for _ in range(3):
        state, metrics, _ = step(state, batch)
    jax.block_until_ready(metrics["loss_total"])

    start = time.perf_counter()
    for _ in range(num_steps):
        state, metrics, _ = step(state, batch)
    jax.block_until_ready(metrics["loss_total"])
    elapsed = time.perf_counter() - start

    steps_per_sec = num_steps / elapsed
    print(json.dumps({
        "metric": "adapt_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
