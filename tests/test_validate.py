"""run_validation over a synthetic val split."""

import numpy as np
import pytest

import jax

from codeps_tpu.config import gen_config
from codeps_tpu.data import Cityscapes, DataLoader
from codeps_tpu.data.synthetic import make_cityscapes_tree
from codeps_tpu.models import build_modules, init_params
from codeps_tpu.tasks.validate import run_validation


def test_run_validation_metrics(tmp_path):
    root = make_cityscapes_tree(tmp_path / "cs", num_frames=4,
                                split="val")
    cfg = gen_config(freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.dataset.name = "cityscapes"
    cfg.dataset.path = str(root)
    cfg.dataset.feed_img_size = [32, 64]
    cfg.dataset.center_heatmap_sigma = 4
    cfg.semantics.class_weights = [1.0] * 14
    cfg.freeze()

    dataset = Cityscapes("val", cfg.dataset, return_depth=True,
                         label_mode="codeps")
    loader = DataLoader(dataset, batch_size=2, offsets=[1], shuffle=False,
                        num_threads=1)

    modules = build_modules(cfg, 14)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))

    metrics = run_validation(cfg, modules, params, stats, loader,
                             dataset.thing_classes, dataset.stuff_classes,
                             dataset.ignore_classes)
    assert 0.0 <= metrics["sem_miou"] <= 1.0
    assert np.isfinite(metrics["d_abs_rel"])
    assert "p_pq" in metrics
    assert metrics["sem_conf"].sum() == 4 * 32 * 64


def test_run_validation_sharded_equals_unsharded(tmp_path):
    """mesh-sharded validation (train.py val path) must reproduce the
    single-device metrics: the eval reductions are batch-weighted sums,
    so SPMD sharding over the batch axis is a pure layout change. The
    8-frame split at global batch 8 also exercises the non-dividing
    fallback (run_validation.place) via a second 8->8 pass... kept to
    one pass for compile cost; the tail fallback is place()'s default
    branch, identical code to the unsharded run."""
    from codeps_tpu.parallel import make_mesh

    root = make_cityscapes_tree(tmp_path / "cs3", num_frames=8,
                                split="val")
    cfg = gen_config(freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.dataset.name = "cityscapes"
    cfg.dataset.path = str(root)
    cfg.dataset.feed_img_size = [32, 64]
    cfg.dataset.center_heatmap_sigma = 4
    cfg.semantics.class_weights = [1.0] * 14
    cfg.freeze()

    dataset = Cityscapes("val", cfg.dataset, return_depth=True,
                         label_mode="codeps")
    modules = build_modules(cfg, 14)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))

    def metrics_for(mesh):
        loader = DataLoader(dataset, batch_size=8, offsets=[1],
                            shuffle=False, num_threads=1)
        return run_validation(cfg, modules, params, stats, loader,
                              dataset.thing_classes,
                              dataset.stuff_classes,
                              dataset.ignore_classes, mesh=mesh)

    single = metrics_for(None)
    sharded = metrics_for(make_mesh())
    for key, value in single.items():
        if np.ndim(value) == 0 and np.issubdtype(
                np.asarray(value).dtype, np.floating):
            np.testing.assert_allclose(sharded[key], value, rtol=1e-5,
                                       err_msg=key)
    np.testing.assert_array_equal(sharded["sem_conf"], single["sem_conf"])


def test_run_validation_losses_and_visuals(tmp_path):
    root = make_cityscapes_tree(tmp_path / "cs2", num_frames=4,
                                split="val")
    cfg = gen_config(freeze=False)
    cfg.model.po_depth_net.params.nof_layers = 18
    cfg.dataset.name = "cityscapes"
    cfg.dataset.path = str(root)
    cfg.dataset.feed_img_size = [32, 64]
    cfg.dataset.center_heatmap_sigma = 4
    cfg.semantics.class_weights = [1.0] * 14
    cfg.freeze()

    dataset = Cityscapes("val", cfg.dataset, return_depth=True,
                         label_mode="codeps")
    loader = DataLoader(dataset, batch_size=2, offsets=[1], shuffle=False,
                        num_threads=1)
    modules = build_modules(cfg, 14)
    params, stats = init_params(jax.random.PRNGKey(0), modules, (32, 64))

    metrics = run_validation(cfg, modules, params, stats, loader,
                             dataset.thing_classes, dataset.stuff_classes,
                             dataset.ignore_classes, compute_loss=True,
                             gen_visuals=True)
    assert np.isfinite(metrics["val_loss"])
    for key in ("val_loss_semantic", "val_loss_depth_recon",
                "val_loss_center", "val_loss_offset"):
        assert np.isfinite(metrics[key]), key
    panels = metrics["visual_panels"]
    assert panels and all(v.dtype == np.uint8 and v.ndim == 3
                          for v in panels.values())
