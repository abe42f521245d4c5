"""Integration: the full AdaptationRunner over synthetic dataset trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codeps_tpu.config import gen_config
from codeps_tpu.data import Cityscapes, Kitti360
from codeps_tpu.data.replay_buffer import ReplayBuffer
from codeps_tpu.data.synthetic import make_cityscapes_tree, make_kitti360_tree
from codeps_tpu.models import build_modules, init_params
from codeps_tpu.tasks import build_optimizer, make_adapt_state
from codeps_tpu.tasks.adapt_loop import AdaptationRunner

NC = 14


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("adapt_loop")
    cs_root = make_cityscapes_tree(tmp_path / "cs", num_frames=6,
                                   width=96, height=64)
    k360_root = make_kitti360_tree(tmp_path / "k360", num_frames=8,
                                   width=96, height=64)
    cfg = gen_config(adapt=True, freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.dataset.name = "kitti_360"
    cfg.dataset.path = str(k360_root)
    cfg.dataset.feed_img_size = [32, 64]
    cfg.dataset.center_heatmap_sigma = 4
    cfg.adapt.source_dataset.name = "cityscapes"
    cfg.adapt.source_dataset.path = str(cs_root)
    cfg.adapt.source_dataset.feed_img_size = [32, 64]
    cfg.adapt.replay_sampler.nof_source_samples = 2
    cfg.adapt.replay_sampler.nof_target_samples = 2
    cfg.adapt.replay_buffer.maximize_diversity = True
    cfg.adapt.replay_buffer.target_size = 3
    cfg.adapt.mixup.general.nof_samples = 2
    cfg.adapt.mixup.general.mixup_strategies = ["cut_mixup",
                                                "conf_instance_mixup"]
    cfg.adapt.ema.semantic = True
    cfg.adapt.model.backbone_po_depth = False
    cfg.adapt.model.instance = False
    cfg.semantics.class_weights = [1.0] * NC
    cfg.freeze()
    return cfg


def test_adaptation_runner_streams(setup):
    cfg = setup
    target = Kitti360("sequence", cfg.dataset, return_depth=True,
                      sequences=["03"], sequence_reference_mode="rgb",
                      label_mode="codeps")
    buffer = ReplayBuffer(target, cfg.adapt, "train")
    source = Cityscapes("train", cfg.adapt.source_dataset,
                        label_mode="codeps")
    buffer.initialize_source_buffer(source, None)

    modules = build_modules(cfg, NC)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))
    frozen = ["backbone_po_depth", "instance_head"]
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(1),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen, ema_alpha=0.99)

    runner = AdaptationRunner(cfg, modules, state, tx, buffer,
                              frozen_modules=frozen, verbose=False)
    meters = runner.run(max_frames=3)

    # losses were recorded
    assert meters["losses"]["loss"].count >= 3
    assert meters["losses"]["semantic_source"].count >= 3
    assert float(meters["losses"]["semantic_cut_mixup"].count) >= 3
    # metrics stream: conf matrix accumulated over all frames
    assert meters["metrics"]["sem_conf"].sum.sum() > 0
    assert 0.0 <= float(meters["metrics"]["sem_miou"].value) <= 1.0
    # student stepped 3 times; frames entered the diversity buffer
    assert int(runner.state.step) == 3
    assert runner.buffer.sim_index is not None
    assert runner.buffer.sim_index.ntotal >= 1


def test_adaptation_runner_spatial_shard(setup):
    """cfg.tpu.spatial_shard=True: the same runner streams with every
    image tensor H-sharded over the 8-device mesh (parallel/spatial.py)
    — the per-frame latency lever the reference's single-GPU cap rules
    out (adapt_codeps.py:391). Numerical equality of the sharded step
    is covered in test_adapt_step.py; this exercises the PRODUCT path:
    runner construction, state replication, per-frame batch placement,
    metric fetches, and buffer adds on sharded outputs."""
    cfg = setup.clone().defrost()
    cfg.tpu.spatial_shard = True
    cfg.freeze()
    target = Kitti360("sequence", cfg.dataset, return_depth=True,
                      sequences=["03"], sequence_reference_mode="rgb",
                      label_mode="codeps")
    buffer = ReplayBuffer(target, cfg.adapt, "train")
    source = Cityscapes("train", cfg.adapt.source_dataset,
                        label_mode="codeps")
    buffer.initialize_source_buffer(source, None)

    modules = build_modules(cfg, NC)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))
    frozen = ["backbone_po_depth", "instance_head"]
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(1),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen, ema_alpha=0.99)

    runner = AdaptationRunner(cfg, modules, state, tx, buffer,
                              frozen_modules=frozen, verbose=False)
    assert runner.spatial_mesh is not None
    assert runner.spatial_mesh.devices.size == 8
    meters = runner.run(max_frames=2)

    assert int(runner.state.step) == 2
    assert meters["losses"]["loss"].count >= 2
    assert meters["metrics"]["sem_conf"].sum.sum() > 0
    assert np.isfinite(float(meters["losses"]["loss"].value))
    assert runner.buffer.sim_index is not None


def test_wandb_interval_streaming(setup):
    """Per-interval observability (adapt_codeps.py:311-337): scalars,
    per-class depth series, and image panels stream through the logger
    at each log interval. Uses a recording fake logger and synthetic
    eval results — no jitted step runs."""
    cfg = setup
    target = Kitti360("sequence", cfg.dataset, return_depth=True,
                      sequences=["03"], sequence_reference_mode="rgb",
                      label_mode="codeps")
    buffer = ReplayBuffer(target, cfg.adapt, "train")
    modules = build_modules(cfg, NC)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))
    frozen = ["backbone_po_depth", "instance_head"]
    from codeps_tpu.tasks import build_optimizer
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(1),
                             ema_modules=("semantic_head",),
                             frozen_modules=frozen, ema_alpha=0.99)

    class FakeLogger:
        enabled = True

        def __init__(self):
            self.calls = []

        def log_scalars(self, mode, losses=None, metrics=None, step=0):
            self.calls.append(("scalars", mode, step,
                               dict(losses or {}), dict(metrics or {})))

        def log_depth_per_class(self, metrics, remove_classes, label_mode,
                                step=0):
            self.calls.append(("depth_per_class", step))

        def log_images(self, prefix, images, step=0):
            self.calls.append(("images", prefix, step, sorted(images)))

    logger = FakeLogger()
    runner = AdaptationRunner(cfg, modules, state, tx, buffer,
                              frozen_modules=frozen, verbose=False,
                              wandb_logger=logger)
    runner.meters["losses"]["loss"].update(1.5)
    runner.meters["metrics"]["sem_miou"].update(0.25)

    # a bare target item (buffer[0] would need an initialized source
    # buffer; the logger only reads sample["target"]["rgb"])
    target_item = buffer.target_data[0]
    rng = np.random.default_rng(0)
    results = {
        "depth": rng.uniform(1, 50, (1, 32, 64, 1)).astype(np.float32),
        "semantic": rng.integers(0, NC, (1, 32, 64)).astype(np.int32),
        "center": rng.uniform(0, 1, (1, 32, 64, 1)).astype(np.float32),
        "offset": rng.normal(0, 3, (1, 32, 64, 2)).astype(np.float32),
        "panoptic": rng.integers(0, 9, (1, 32, 64)).astype(np.int32),
    }
    runner._log_wandb_interval(7, {"target": target_item}, results)

    kinds = [c[0] for c in logger.calls]
    assert kinds == ["scalars", "depth_per_class", "images"]
    scalars = logger.calls[0]
    assert scalars[1] == "adapt" and scalars[2] == 7
    assert scalars[3]["loss"] == 1.5
    assert scalars[4]["sem_miou"] == 0.25
    images = logger.calls[2]
    assert images[1] == "adapt/batch"
    panel_names = images[3]
    for key in ("rgb_0", "depth_0", "semantic_0", "center_0",
                "offset_0", "panoptic_0"):
        assert key in panel_names, key


def test_adaptation_runner_eval_only(setup):
    """cfg.adapt.mode='off': the runner streams the standalone teacher
    eval per frame (no gradient steps, no buffer adds) and accumulates
    metrics — the reference's evaluation-only mode
    (scripts/adapt_codeps.py:155-255 with disable_adaptation)."""
    cfg = setup.clone().defrost()
    cfg.adapt.mode = "off"
    cfg.freeze()
    target = Kitti360("sequence", cfg.dataset, return_depth=True,
                      sequences=["03"], sequence_reference_mode="rgb",
                      label_mode="codeps")
    buffer = ReplayBuffer(target, cfg.adapt, "train")
    source = Cityscapes("train", cfg.adapt.source_dataset,
                        label_mode="codeps")
    buffer.initialize_source_buffer(source, None)
    modules = build_modules(cfg, NC)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))
    frozen = ["backbone_po_depth", "instance_head"]
    from codeps_tpu.tasks import build_optimizer
    tx = build_optimizer(cfg, cfg.train.optimizer.learning_rate,
                         frozen_modules=frozen)
    state = make_adapt_state(params, stats, tx, jax.random.PRNGKey(1),
                             ema_modules=(), frozen_modules=frozen,
                             ema_alpha=0.99)
    runner = AdaptationRunner(cfg, modules, state, tx, buffer,
                              frozen_modules=frozen, verbose=False)
    assert runner.disable_adaptation
    meters = runner.run(max_frames=2)
    # no student updates, metrics accumulated
    assert int(runner.state.step) == 0
    assert meters["metrics"]["sem_conf"].sum.sum() > 0
    assert np.isfinite(float(meters["metrics"]["d_abs_rel"].value))
    assert meters["losses"]["loss"].count == 0
