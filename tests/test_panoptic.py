"""Golden parity tests: vectorized panoptic fusion vs the reference
misc/post_processing_panoptic.py (pure torch, imported directly)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from codeps_tpu.ops.panoptic import (find_instance_centers,
                                     get_panoptic_segmentation, group_pixels)

from misc import post_processing_panoptic as ref  # reference oracle

RNG = np.random.default_rng(11)

H, W, C = 48, 64, 14
THING_LIST = (9, 10, 11, 12, 13)


def _synthetic_predictions(num_instances=4, seed=0):
    """Center heatmap with gaussian peaks + offsets pointing at centers."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform([4, 4], [H - 4, W - 4], (num_instances, 2))
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)

    heatmap = np.zeros((H, W), np.float32)
    offsets = np.zeros((2, H, W), np.float32)
    nearest = np.full((H, W), -1, np.int32)
    best_d = np.full((H, W), np.inf, np.float32)
    for i, (cy, cx) in enumerate(centers):
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        heatmap = np.maximum(heatmap, np.exp(-d2 / (2 * 6.0 ** 2)))
        closer = d2 < best_d
        best_d = np.where(closer, d2, best_d)
        nearest = np.where(closer, i, nearest)
    for i, (cy, cx) in enumerate(centers):
        offsets[0] = np.where(nearest == i, cy - yy, offsets[0])
        offsets[1] = np.where(nearest == i, cx - xx, offsets[1])
    offsets += rng.normal(0, 0.3, offsets.shape).astype(np.float32)

    # semantic: horizontal stuff bands + thing blobs around the centers
    semantic = (yy / H * 6).astype(np.int64)  # stuff classes 0..5
    for i, (cy, cx) in enumerate(centers):
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < rng.uniform(30, 80)
        semantic[blob] = THING_LIST[i % len(THING_LIST)]
    semantic[0, :3] = 255  # a few void pixels

    logits = np.full((C, H, W), -5.0, np.float32)
    np.put_along_axis(logits, np.minimum(semantic, C - 1)[None], 5.0, axis=0)
    probs = torch.softmax(torch.tensor(logits), 0).numpy()
    # void: make argmax land on class 0 but mark semantic separately
    return probs, heatmap, offsets, semantic


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_find_instance_centers_matches_reference(seed):
    _, heatmap, _, _ = _synthetic_predictions(seed=seed)
    hm_t = torch.tensor(heatmap)[None, None]
    ref_centers = ref.find_instance_center(hm_t.clone(), threshold=0.1,
                                           nms_kernel=7, top_k=200).numpy()

    ours = find_instance_centers(jnp.asarray(heatmap), threshold=0.1,
                                 nms_kernel=7, top_k=200)
    valid = np.asarray(ours.valid)
    got = np.asarray(ours.yx)[valid].astype(np.int64)
    assert got.shape == ref_centers.shape
    np.testing.assert_array_equal(got, ref_centers)


@pytest.mark.parametrize("seed", [0, 3])
def test_group_pixels_matches_reference(seed):
    _, heatmap, offsets, _ = _synthetic_predictions(seed=seed)
    hm_t = torch.tensor(heatmap)[None, None]
    ctr_t = ref.find_instance_center(hm_t.clone(), threshold=0.1,
                                     nms_kernel=7, top_k=200)
    ref_ids = ref.group_pixels(ctr_t, torch.tensor(offsets)[None]).numpy()[0]

    centers = find_instance_centers(jnp.asarray(heatmap), 0.1, 7, 200)
    ours = group_pixels(centers, jnp.asarray(offsets.transpose(1, 2, 0)))
    np.testing.assert_array_equal(np.asarray(ours), ref_ids)


@pytest.mark.parametrize("top_k", [3, 4, 6])
def test_crowded_scene_strict_topk_parity(top_k):
    # With >= top_k candidates the reference keeps only centers STRICTLY
    # above the top_k-th score (nonzero(hm > top_k_scores[-1]) — at most
    # top_k-1 survive), not the full top-k set.
    _, heatmap, offsets, _ = _synthetic_predictions(num_instances=6,
                                                    seed=4)
    hm_t = torch.tensor(heatmap)[None, None]
    ref_centers = ref.find_instance_center(
        hm_t.clone(), threshold=0.1, nms_kernel=7, top_k=top_k)

    ours = find_instance_centers(jnp.asarray(heatmap), threshold=0.1,
                                 nms_kernel=7, top_k=top_k)
    valid = np.asarray(ours.valid)
    got = np.asarray(ours.yx)[valid].astype(np.int64)
    np.testing.assert_array_equal(got, ref_centers.numpy())

    ref_ids = ref.group_pixels(ref_centers,
                               torch.tensor(offsets)[None]).numpy()[0]
    got_ids = group_pixels(ours, jnp.asarray(offsets.transpose(1, 2, 0)))
    np.testing.assert_array_equal(np.asarray(got_ids), ref_ids)


def test_topk_not_multiple_of_chunk():
    # The reference supports arbitrary top_k; the lax grouping path pads
    # the center list internally instead of asserting divisibility.
    probs, heatmap, offsets, semantic = _synthetic_predictions(
        num_instances=3, seed=2)
    sem_pred = probs.argmax(0)
    sem_pred[semantic == 255] = 255

    ref_pan, _, ref_inst = ref.get_panoptic_segmentation(
        torch.tensor(sem_pred[None]),
        torch.tensor(heatmap)[None, None],
        torch.tensor(offsets)[None],
        list(THING_LIST), label_divisor=1000, stuff_area=0, void_label=255,
        threshold=0.1, nms_kernel=7, top_k=5)

    pan, inst, _ = get_panoptic_segmentation(
        jnp.asarray(sem_pred.astype(np.int32)), jnp.asarray(heatmap),
        jnp.asarray(offsets.transpose(1, 2, 0)), THING_LIST,
        label_divisor=1000, stuff_area=0, void_label=255,
        threshold=0.1, nms_kernel=7, top_k=5, num_classes=C,
        use_pallas=False)
    np.testing.assert_array_equal(np.asarray(inst), ref_inst.numpy()[0])
    np.testing.assert_array_equal(np.asarray(pan), ref_pan.numpy()[0])


def test_fusion_accepts_two_channel_thing_mask():
    # The raw InstanceHead thing-mask is 2-channel; the reference argmaxes
    # 4-dim foreground masks internally (post_processing_panoptic.py:56-60)
    # and our single-image path mirrors that for (H, W, 2) inputs.
    probs, heatmap, offsets, semantic = _synthetic_predictions(seed=1)
    sem_pred = probs.argmax(0)
    fg_binary = np.isin(sem_pred, THING_LIST).astype(np.int32)
    fg_raw = np.stack([1.0 - fg_binary, fg_binary + 0.0],
                      axis=-1).astype(np.float32)  # (H, W, 2)

    args = (jnp.asarray(sem_pred.astype(np.int32)), jnp.asarray(heatmap),
            jnp.asarray(offsets.transpose(1, 2, 0)), THING_LIST)
    kwargs = dict(label_divisor=1000, stuff_area=0, void_label=255,
                  threshold=0.1, nms_kernel=7, top_k=200, num_classes=C)
    pan_b, inst_b, _ = get_panoptic_segmentation(
        *args, foreground_mask=jnp.asarray(fg_binary), **kwargs)
    pan_r, inst_r, _ = get_panoptic_segmentation(
        *args, foreground_mask=jnp.asarray(fg_raw), **kwargs)
    np.testing.assert_array_equal(np.asarray(inst_r), np.asarray(inst_b))
    np.testing.assert_array_equal(np.asarray(pan_r), np.asarray(pan_b))


@pytest.mark.parametrize("seed,num_instances", [(0, 4), (1, 6), (2, 1),
                                                (5, 0)])
def test_panoptic_fusion_matches_reference(seed, num_instances):
    probs, heatmap, offsets, semantic = _synthetic_predictions(
        num_instances=max(num_instances, 1), seed=seed)
    if num_instances == 0:
        heatmap = np.zeros_like(heatmap)  # no centers pass the threshold

    sem_pred = probs.argmax(0)
    sem_pred[semantic == 255] = 255  # inject void as the pipeline would

    ref_pan, ref_center, ref_inst = ref.get_panoptic_segmentation(
        torch.tensor(sem_pred[None]),
        torch.tensor(heatmap)[None, None],
        torch.tensor(offsets)[None],
        list(THING_LIST), label_divisor=1000, stuff_area=0, void_label=255,
        threshold=0.1, nms_kernel=7, top_k=200)

    pan, inst, centers = get_panoptic_segmentation(
        jnp.asarray(sem_pred.astype(np.int32)),
        jnp.asarray(heatmap),
        jnp.asarray(offsets.transpose(1, 2, 0)),
        THING_LIST, label_divisor=1000, stuff_area=0, void_label=255,
        threshold=0.1, nms_kernel=7, top_k=200, num_classes=C)

    # Reference void in the *panoptic* map is -1
    # (misc/post_processing_panoptic.py:180-182).
    np.testing.assert_array_equal(np.asarray(inst), ref_inst.numpy()[0])
    np.testing.assert_array_equal(np.asarray(pan), ref_pan.numpy()[0])


def test_panoptic_fusion_stuff_area_threshold():
    probs, heatmap, offsets, semantic = _synthetic_predictions(seed=4)
    sem_pred = probs.argmax(0)

    ref_pan, _, _ = ref.get_panoptic_segmentation(
        torch.tensor(sem_pred[None]),
        torch.tensor(heatmap)[None, None],
        torch.tensor(offsets)[None],
        list(THING_LIST), label_divisor=1000, stuff_area=400, void_label=255,
        threshold=0.1, nms_kernel=7, top_k=200)

    pan, _, _ = get_panoptic_segmentation(
        jnp.asarray(sem_pred.astype(np.int32)), jnp.asarray(heatmap),
        jnp.asarray(offsets.transpose(1, 2, 0)),
        THING_LIST, label_divisor=1000, stuff_area=400, void_label=255,
        threshold=0.1, nms_kernel=7, top_k=200, num_classes=C)
    np.testing.assert_array_equal(np.asarray(pan), ref_pan.numpy()[0])
