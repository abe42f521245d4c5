"""Golden parity tests: evaluation metrics vs the torch reference
(eval/depth.py, eval/semantic.py, eval/panoptic.py — all torch-only)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from codeps_tpu.evaluation import (PanopticEvaluator, compute_confusion_matrix,
                                   compute_depth_metrics, compute_sem_miou)

from eval.depth import DepthEvaluator as RefDepthEvaluator
from eval.panoptic import PanopticEvaluator as RefPanopticEvaluator
from eval.semantic import SemanticEvaluator as RefSemanticEvaluator

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("use_gt_scale,garg", [(True, False), (False, False),
                                               (True, True)])
def test_depth_metrics_match_reference(use_gt_scale, garg):
    batch, height, width = 3, 24, 32
    gt = RNG.uniform(0.5, 90, (batch, height, width)).astype(np.float32)
    gt[RNG.uniform(size=gt.shape) < 0.3] = 0.0  # void
    pred = RNG.uniform(0.5, 90, (batch, 1, height, width)).astype(np.float32)

    ref_eval = RefDepthEvaluator(use_gt_scale=use_gt_scale,
                                 depth_ranges=(0.1, 80),
                                 use_garg_crop=garg)
    ref = ref_eval.compute_depth_metrics(torch.tensor(gt),
                                         torch.tensor(pred))

    ours = compute_depth_metrics(jnp.asarray(gt),
                                 jnp.asarray(pred.transpose(0, 2, 3, 1)),
                                 use_gt_scale=use_gt_scale,
                                 depth_ranges=(0.1, 80),
                                 use_garg_crop=garg)
    for key, value in ref.items():
        np.testing.assert_allclose(np.asarray(ours[key]), value.numpy(),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"metric {key}")


@pytest.mark.parametrize("ignore_classes", [[], [3, 6]])
def test_confusion_matrix_matches_reference(ignore_classes):
    num_classes = 14
    pred = RNG.integers(0, num_classes, (2, 16, 20)).astype(np.uint8)
    gt = RNG.integers(0, num_classes, (2, 16, 20)).astype(np.uint8)
    gt[0, :2] = 255

    ref_eval = RefSemanticEvaluator(num_classes=num_classes,
                                    ignore_classes=ignore_classes)
    ref_mat = ref_eval.compute_confusion_matrix(torch.tensor(pred),
                                                torch.tensor(gt)).numpy()
    ours = compute_confusion_matrix(jnp.asarray(pred), jnp.asarray(gt),
                                    num_classes, ignore_classes)
    np.testing.assert_array_equal(np.asarray(ours), ref_mat)

    ref_miou = ref_eval.compute_sem_miou(torch.tensor(ref_mat).float())
    ours_miou = compute_sem_miou(ours, num_classes, ignore_classes)
    np.testing.assert_allclose(ours_miou, ref_miou.numpy(), rtol=1e-5)

    ref_miou_px = ref_eval.compute_sem_miou(torch.tensor(ref_mat).float(),
                                            sum_pixels=True)
    ours_miou_px = compute_sem_miou(ours, num_classes, ignore_classes,
                                    sum_pixels=True)
    np.testing.assert_allclose(ours_miou_px, ref_miou_px.numpy(), rtol=1e-5)


def _random_panoptic(seed, num_classes=14, things=(9, 10, 11, 12, 13),
                     shape=(40, 56)):
    """Random blocky panoptic map with things/stuff/void."""
    rng = np.random.default_rng(seed)
    pan = np.full(shape, -1, np.int64)
    for _ in range(12):
        y, x = rng.integers(0, shape[0] - 6), rng.integers(0, shape[1] - 6)
        h, w = rng.integers(4, 14), rng.integers(4, 18)
        cls = int(rng.integers(0, num_classes))
        if cls in things:
            inst = int(rng.integers(1, 4))
            pan[y:y + h, x:x + w] = cls * 1000 + inst
        else:
            pan[y:y + h, x:x + w] = cls * 1000
    return pan


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pq_matches_reference(seed):
    stuff = list(range(9))
    things = [9, 10, 11, 12, 13]
    gt = np.stack([_random_panoptic(seed), _random_panoptic(seed + 100)])
    pred = np.stack([_random_panoptic(seed + 1),
                     _random_panoptic(seed + 101)])
    # make pred partially agree with gt for nonzero TP counts
    agree = np.random.default_rng(seed).uniform(size=gt.shape) < 0.6
    pred = np.where(agree, gt, pred)

    ref_eval = RefPanopticEvaluator(stuff_list=stuff, thing_list=things)
    ref_eval.update(torch.tensor(gt.copy()), torch.tensor(pred.copy()))
    ref_res = ref_eval.evaluate()

    ours_eval = PanopticEvaluator(stuff_list=stuff, thing_list=things)
    ours_eval.update(gt, pred)
    ours_res = ours_eval.evaluate()

    for group in ("Things", "Stuff", "All"):
        for key in ("pq", "sq", "rq", "n"):
            np.testing.assert_allclose(
                ours_res[group][key], ref_res[group][key], rtol=1e-6,
                err_msg=f"{group}/{key}")
    for cls, vals in ref_res["per_class"].items():
        for key in ("pq", "sq", "rq"):
            np.testing.assert_allclose(ours_res["per_class"][cls][key],
                                       vals[key], rtol=1e-6,
                                       err_msg=f"class {cls}/{key}")


def test_depth_metrics_per_class_match_reference():
    num_classes = 6
    gt = RNG.uniform(0.5, 70, (2, 20, 28)).astype(np.float32)
    gt[RNG.uniform(size=gt.shape) < 0.2] = 0.0
    pred = RNG.uniform(0.5, 70, (2, 20, 28, 1)).astype(np.float32)
    semantic = RNG.integers(0, num_classes, (2, 20, 28)).astype(np.int64)
    semantic[0, 0, :5] = 255  # void pixels

    ref_eval = RefDepthEvaluator(use_gt_scale=True, depth_ranges=(0.1, 80))
    # reference expects depth_pred as (B, 1, H, W) (model output layout)
    ref = ref_eval.compute_depth_metrics_per_class(
        torch.tensor(gt), torch.tensor(pred.transpose(0, 3, 1, 2)),
        torch.tensor(semantic))

    from codeps_tpu.evaluation import compute_depth_metrics_per_class
    ours = compute_depth_metrics_per_class(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(semantic),
        num_classes=num_classes, use_gt_scale=True, depth_ranges=(0.1, 80))

    for key, value in ref.items():
        np.testing.assert_allclose(np.asarray(ours[key]), value.numpy(),
                                   rtol=1e-3, atol=1e-4, err_msg=key)


def test_panoptic_meter_matches_reference():
    from codeps_tpu.evaluation import PanopticMeter
    from eval.meters import PanopticMeter as RefPanopticMeter

    num_classes = 5
    ours = PanopticMeter(num_classes, momentum=0.9)
    ref = RefPanopticMeter((4, num_classes), momentum=0.9)
    for _ in range(4):
        # iou sums, tp, fn, fp — keep denominators positive so the
        # reference's unguarded division stays finite.
        stats = np.stack([RNG.uniform(0, 3, num_classes),
                          RNG.integers(1, 5, num_classes),
                          RNG.integers(0, 3, num_classes),
                          RNG.integers(0, 3, num_classes)]).astype(np.float32)
        ours.update(stats)
        ref.update(torch.tensor(stats))
    np.testing.assert_allclose(ours.panoptic(), ref.panoptic().numpy(),
                               rtol=1e-6)
    np.testing.assert_allclose(float(ours.value), float(ref.avg), rtol=1e-6)
