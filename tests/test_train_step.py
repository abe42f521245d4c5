"""End-to-end pretraining step tests: single-device and 8-device sharded.

Covers SURVEY.md §7 build stage 3 (minimum end-to-end slice: depth-only
train step) and stage 4 (multi-task step, data-parallel over the mesh).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codeps_tpu.config import get_cfg_defaults
from codeps_tpu.models import build_modules, init_params
from codeps_tpu.parallel import make_mesh, replicate, shard_batch
from codeps_tpu.tasks import TrainState, build_optimizer, build_schedule, \
    make_train_step

RNG = np.random.default_rng(5)
H, W = 64, 96
NUM_CLASSES = 14


def _cfg(make_depth=True, make_semantic=True, make_instance=True,
         make_sflow=False):
    cfg = get_cfg_defaults()
    cfg.model.make_depth = make_depth
    cfg.model.make_sflow = make_sflow
    cfg.model.make_semantic = make_semantic
    cfg.model.make_instance = make_instance
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.model.pose_sflow_net.params.nof_layers = 18
    cfg.semantics.class_weights = tuple([1.0] * NUM_CLASSES)
    return cfg


def _batch(batch_size, with_depth_gt=False):
    batch = {
        "frames": jnp.asarray(
            RNG.uniform(0, 1, (batch_size, 3, H, W, 3)).astype(np.float32)),
        "camera": jnp.asarray(
            np.tile([[40.0, 40.0, W / 2, H / 2]],
                    (batch_size, 1)).astype(np.float32)),
        "semantic": jnp.asarray(
            RNG.integers(0, NUM_CLASSES, (batch_size, H, W)).astype(np.int32)),
        "semantic_weights": jnp.ones((batch_size, H, W), jnp.float32),
        "center": jnp.asarray(
            RNG.uniform(0, 1, (batch_size, H, W, 1)).astype(np.float32)),
        "center_weights": jnp.ones((batch_size, H, W, 1), jnp.float32),
        "offset": jnp.asarray(
            RNG.normal(0, 5, (batch_size, H, W, 2)).astype(np.float32)),
        "offset_weights": jnp.ones((batch_size, H, W, 1), jnp.float32),
        "thing_mask": jnp.asarray(
            RNG.integers(0, 2, (batch_size, H, W)).astype(np.int32)),
    }
    if with_depth_gt:
        batch["depth_gt"] = jnp.asarray(
            RNG.uniform(0, 60, (batch_size, H, W)).astype(np.float32))
    return batch


def _make_state_and_step(cfg, frozen=()):
    modules = build_modules(cfg, num_classes=NUM_CLASSES)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (H, W))
    schedule = build_schedule(cfg, steps_per_epoch=10)
    tx = build_optimizer(cfg, schedule, frozen_modules=frozen)
    state = TrainState(params=params, batch_stats=stats,
                       opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(1))
    step = make_train_step(modules, cfg, tx,
                           class_weights=list(cfg.semantics.class_weights),
                           donate=False)
    return modules, state, step


def test_depth_only_train_step():
    """BASELINE.json config #1: depth-only slice."""
    cfg = _cfg(make_semantic=False, make_instance=False)
    _, state, step = _make_state_and_step(cfg)
    batch = _batch(2, with_depth_gt=True)

    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_total"]))
    assert float(metrics["depth_recon"]) > 0
    assert "d_abs_rel" in metrics
    # params actually moved
    delta = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.params["depth_head"],
                         new_state.params["depth_head"])
    assert max(jax.tree.leaves(delta)) > 0

    # loss decreases over a few steps on a fixed batch
    losses = [float(metrics["loss_total"])]
    for _ in range(3):
        state, metrics = step(new_state, batch)
        new_state = state
        losses.append(float(metrics["loss_total"]))
    assert losses[-1] < losses[0]


def test_multitask_train_step():
    cfg = _cfg()
    _, state, step = _make_state_and_step(cfg)
    batch = _batch(2)

    _, metrics = step(state, batch)
    for key in ("depth_recon", "depth_smth", "semantic", "center", "offset"):
        assert np.isfinite(float(metrics[key])), key
    assert metrics["sem_conf"].shape == (NUM_CLASSES, NUM_CLASSES)
    assert int(jnp.sum(metrics["sem_conf"])) == 2 * H * W


def test_multitask_with_sflow_train_step():
    cfg = _cfg(make_sflow=True)
    _, state, step = _make_state_and_step(cfg)
    batch = _batch(1)
    _, metrics = step(state, batch)
    for key in ("flow_smth", "flow_sparsity"):
        assert np.isfinite(float(metrics[key])), key


def test_frozen_module_gets_no_updates():
    cfg = _cfg(make_semantic=False, make_instance=False)
    _, state, step = _make_state_and_step(
        cfg, frozen=("backbone_po_depth",))
    batch = _batch(1)
    new_state, _ = step(state, batch)
    frozen_delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["backbone_po_depth"],
        new_state.params["backbone_po_depth"])
    assert max(jax.tree.leaves(frozen_delta)) == 0.0
    live_delta = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.params["depth_head"], new_state.params["depth_head"])
    assert max(jax.tree.leaves(live_delta)) > 0


def test_sharded_train_step_over_mesh():
    """Data-parallel pretrain over the 8-device CPU mesh (§2.8 parity)."""
    cfg = _cfg()
    _, state, step = _make_state_and_step(cfg)
    mesh = make_mesh()
    assert mesh.devices.size == 8

    state = replicate(state, mesh)
    batch = shard_batch(_batch(8), mesh)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss_total"]))
    # global conf-matrix covers the full global batch
    assert int(jnp.sum(metrics["sem_conf"])) == 8 * H * W

    # equivalent single-device result (same params, same batch): loss must
    # match the sharded run (SPMD == one big batch).
    _, metrics_single = step(jax.device_get(state) and state, batch)
    np.testing.assert_allclose(float(metrics["loss_total"]),
                               float(metrics_single["loss_total"]),
                               rtol=1e-5)


def test_shard_batch_multihost_single_process():
    """Per-host global-batch assembly (multi-process SPMD path in
    scripts/train.py): on a single process it must produce exactly the
    device_put sharding and values."""
    from codeps_tpu.parallel import shard_batch_multihost

    mesh = make_mesh()
    batch = {"x": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "y": np.ones((8, 2, 3), np.int32)}
    local = shard_batch(batch, mesh)
    global_arr = shard_batch_multihost(batch, mesh)
    for key in batch:
        np.testing.assert_array_equal(np.asarray(local[key]),
                                      np.asarray(global_arr[key]))
        assert global_arr[key].sharding.spec == local[key].sharding.spec
