"""Worker process for the 2-process SPMD proof test.

Launched by tests/test_multihost.py as `python _multihost_worker.py
<process_id> <coordinator> <out_json>` with JAX_PLATFORMS=cpu and 4
virtual devices per process (8 global). Mirrors the torchrun 2-process
layout of the reference (/root/reference/scripts/train.sh:12-14): each
process feeds its LOCAL slice of the global batch through
shard_batch_multihost and runs ONE jitted train step; process 0 reports
the loss and a parameter digest for comparison against the
single-process 8-device run.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

H, W = 64, 96
NUM_CLASSES = 14
GLOBAL_BATCH = 8


def build_global_batch():
    """Deterministic global batch (identical in every process)."""
    rng = np.random.default_rng(123)
    return {
        "frames": rng.uniform(
            0, 1, (GLOBAL_BATCH, 3, H, W, 3)).astype(np.float32),
        "camera": np.tile([[40.0, 40.0, W / 2, H / 2]],
                          (GLOBAL_BATCH, 1)).astype(np.float32),
        "depth_gt": rng.uniform(
            0, 60, (GLOBAL_BATCH, H, W)).astype(np.float32),
    }


def build_val_loader():
    """Two deterministic val batches: one mesh-divisible (8) and one
    drop_last=False tail (3) — exercising both placement paths of
    run_validation.place()."""
    rng = np.random.default_rng(77)

    def make(n):
        return {
            "frames": rng.uniform(
                0, 1, (n, 3, H, W, 3)).astype(np.float32),
            "camera": np.tile([[40.0, 40.0, W / 2, H / 2]],
                              (n, 1)).astype(np.float32),
            "depth_gt": rng.uniform(0, 60, (n, H, W)).astype(np.float32),
        }

    return [make(GLOBAL_BATCH), make(3)]


def build_state_and_step(cfg_overrides=None):
    import jax
    import jax.numpy as jnp

    from codeps_tpu.config import get_cfg_defaults
    from codeps_tpu.models import build_modules, init_params
    from codeps_tpu.tasks import (TrainState, build_optimizer,
                                  build_schedule, make_train_step)

    cfg = get_cfg_defaults()
    cfg.model.make_depth = True
    cfg.model.make_sflow = False
    cfg.model.make_semantic = False
    cfg.model.make_instance = False
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.model.pose_sflow_net.params.nof_layers = 18
    cfg.semantics.class_weights = tuple([1.0] * NUM_CLASSES)

    modules = build_modules(cfg, num_classes=NUM_CLASSES)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (H, W))
    schedule = build_schedule(cfg, steps_per_epoch=10)
    tx = build_optimizer(cfg, schedule)
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(1))
    step = make_train_step(modules, cfg, tx,
                           class_weights=list(cfg.semantics.class_weights),
                           donate=False)
    return state, step, modules, cfg


def digest(tree):
    import jax
    return float(sum(float(np.abs(np.asarray(leaf)).sum())
                     for leaf in jax.tree.leaves(tree)))


def main():
    process_id = int(sys.argv[1])
    coordinator = sys.argv[2]
    out_path = sys.argv[3]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=process_id)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8, jax.devices()

    from codeps_tpu.parallel import make_mesh, replicate, \
        shard_batch_multihost

    mesh = make_mesh()
    state, step, modules, cfg = build_state_and_step()
    state = replicate(state, mesh)

    # local contiguous slice: global device order is process-major, so
    # process p owns rows [p*4, (p+1)*4) of the batch axis
    global_batch = build_global_batch()
    per_host = GLOBAL_BATCH // 2
    local = {key: value[process_id * per_host:(process_id + 1) * per_host]
             for key, value in global_batch.items()}
    batch = shard_batch_multihost(local, mesh)

    new_state, metrics = step(state, batch)
    loss = float(metrics["loss_total"])

    # mesh-sharded validation in multi-process SPMD: every process runs
    # the full deterministic loader; run_validation.place() contributes
    # per-host slices (divisible batch) or replicates (tail batch)
    from codeps_tpu.tasks.validate import run_validation
    # gen_visuals consumes per-SAMPLE step outputs on the host — with
    # 2 processes those come back batch-sharded and must be allgathered
    # by run_validation's gather_for_host path before np.asarray.
    val_metrics = run_validation(
        cfg, modules, new_state.params, new_state.batch_stats,
        build_val_loader(), thing_list=(), stuff_list=(), mesh=mesh,
        gen_visuals=True)

    # save_checkpoint is a COLLECTIVE under Orbax (global barriers;
    # the primary host does the writing): every process must enter.
    # Regression coverage for scripts/train.py's epoch save — a
    # lead-only call deadlocks on Orbax's save_start barrier.
    from codeps_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    ckpt_path = str(Path(out_path).parent / "mh_ckpt" / "epoch_0")
    save_checkpoint(ckpt_path, cfg, 0, 1,
                    jax.device_get(new_state.params),
                    jax.device_get(new_state.batch_stats),
                    opt_state=jax.device_get(new_state.opt_state),
                    rng=jax.device_get(new_state.rng))
    # Both processes restore (harmless if restore also synchronizes).
    ckpt = load_checkpoint(ckpt_path)

    if process_id == 0:
        panels = val_metrics["visual_panels"]
        result = {
            "loss_total": loss,
            "depth_recon": float(metrics["depth_recon"]),
            "param_digest": digest(new_state.params),
            "ckpt_param_digest": digest(ckpt["state_dict"]["params"]),
            "val_d_abs_rel": float(val_metrics["d_abs_rel"]),
            "val_d_a1": float(val_metrics["d_a1"]),
            "val_panels_count": len(panels),
            "val_panels_digest": float(sum(
                np.asarray(p, np.float64).sum() for p in panels.values())),
        }
        Path(out_path).write_text(json.dumps(result))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
