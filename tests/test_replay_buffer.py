"""Replay buffer + mixup pipeline tests on synthetic dataset trees."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from codeps_tpu.config import gen_config
from codeps_tpu.data import Cityscapes, Kitti360
from codeps_tpu.data.mixup import Mixup, distance_transform_manhattan, warp_c2c
from codeps_tpu.data.replay_buffer import ReplayBuffer
from codeps_tpu.data.synthetic import make_cityscapes_tree, make_kitti360_tree

RNG = np.random.default_rng(41)


def _adapt_cfg(tmp_path, nof_target=2, diversity=True, target_size=4):
    cs_root = make_cityscapes_tree(tmp_path / "cs", num_frames=6)
    k360_root = make_kitti360_tree(tmp_path / "k360", num_frames=10)
    cfg = gen_config(adapt=True, freeze=False)
    cfg.dataset.name = "kitti_360"
    cfg.dataset.path = str(k360_root)
    cfg.dataset.feed_img_size = [32, 48]
    cfg.dataset.center_heatmap_sigma = 4
    cfg.adapt.source_dataset.name = "cityscapes"
    cfg.adapt.source_dataset.path = str(cs_root)
    cfg.adapt.source_dataset.feed_img_size = [32, 48]
    cfg.adapt.replay_sampler.nof_source_samples = 2
    cfg.adapt.replay_sampler.nof_target_samples = nof_target
    cfg.adapt.replay_buffer.maximize_diversity = diversity
    cfg.adapt.replay_buffer.target_size = target_size
    cfg.adapt.mixup.general.nof_samples = 2
    cfg.adapt.mixup.general.mixup_strategies = ["cut_mixup", "cut_mixup"]
    cfg.adapt.mixup.cut_mix.nof_vert_splits = 4
    cfg.adapt.mixup.cut_mix.nof_hor_splits = 2
    cfg.adapt.mixup.cut_mix.nof_segments = 2
    cfg.freeze()
    return cfg


def _make_buffer(tmp_path, cfg, mode="train"):
    target = Kitti360("sequence", cfg.dataset, sequences=["03"],
                      sequence_reference_mode="rgb", label_mode="codeps")
    buffer = ReplayBuffer(target, cfg.adapt, mode)
    if mode == "train":
        source = Cityscapes("train", cfg.adapt.source_dataset,
                            label_mode="codeps")
        buffer.initialize_source_buffer(source, number_samples=None)
    return buffer


def test_replay_buffer_train_item(tmp_path):
    cfg = _adapt_cfg(tmp_path)
    buffer = _make_buffer(tmp_path, cfg)
    assert len(buffer) > 0

    item = buffer[0]
    assert "target" in item and "source" in item
    assert len(item["source"]) == 2
    assert item["source"][0]["rgb"][0].shape == (32, 48, 3)
    assert "target_augmented" in item
    assert "cut_mixup" in item and len(item["cut_mixup"]) == 2
    mix = item["cut_mixup"][0]
    for key in ("rgb_src", "rgb_tgt", "semantic_src", "instance_src",
                "camera_model_src", "camera_model_tgt", "tgt_is_replay"):
        assert key in mix, key
    assert isinstance(item["target_is_low_contrast"], bool)


def test_replay_buffer_val_forwards_target(tmp_path):
    cfg = _adapt_cfg(tmp_path)
    buffer = _make_buffer(tmp_path, cfg, mode="val")
    item = buffer[0]
    assert "rgb" in item  # bare target sample


def test_replay_buffer_split_ratio(tmp_path):
    cfg = _adapt_cfg(tmp_path)
    target_full = Kitti360("sequence", cfg.dataset, sequences=["03"],
                           sequence_reference_mode="rgb",
                           label_mode="codeps")
    total = len(target_full)
    train_buffer = ReplayBuffer(
        Kitti360("sequence", cfg.dataset, sequences=["03"],
                 sequence_reference_mode="rgb", label_mode="codeps"),
        cfg.adapt, "train")
    val_buffer = ReplayBuffer(
        Kitti360("sequence", cfg.dataset, sequences=["03"],
                 sequence_reference_mode="rgb", label_mode="codeps"),
        cfg.adapt, "val")
    assert len(train_buffer) == int(total * 0.7)
    assert len(train_buffer) + len(val_buffer) == total


def test_val_split_semantic_reference_mode(tmp_path):
    """The held-out val ReplayBuffer is built on a
    sequence_reference_mode="semantic" dataset (misc/adapt_utils.py:69):
    the split index is computed over the FULL rgb stream (len + skipped)
    and then shifted down by the annotations skipped before it
    (datasets/replay_buffer.py:32-39), so train (rgb-mode) and val
    (semantic-mode) partition the stream consistently.

    Synthetic tree: frames 1..10 streamed, frames 3 and 6 unannotated.
    Reference arithmetic: index = int((8 + 2) * 0.7) = 7 over the rgb
    stream -> train = rgb frames 1..7; val index = 7 - skipped[:7]
    = 7 - 2 = 5 -> val = annotated frames [8, 9, 10].
    """
    cs_root = make_cityscapes_tree(tmp_path / "cs", num_frames=6)
    k360_root = make_kitti360_tree(tmp_path / "k360", num_frames=10,
                                   semantic_gaps=(3, 6))
    cfg = gen_config(adapt=True, freeze=False)
    cfg.dataset.name = "kitti_360"
    cfg.dataset.path = str(k360_root)
    cfg.dataset.feed_img_size = [32, 48]
    cfg.adapt.source_dataset.name = "cityscapes"
    cfg.adapt.source_dataset.path = str(cs_root)
    cfg.freeze()

    train_target = Kitti360("sequence", cfg.dataset, sequences=["03"],
                            sequence_reference_mode="rgb",
                            label_mode="codeps")
    assert len(train_target) == 10
    val_target = Kitti360("sequence", cfg.dataset, sequences=["03"],
                          sequence_reference_mode="semantic",
                          label_mode="codeps")
    assert len(val_target) == 8
    assert sum(val_target.semantic_seq_mode_image_skipped) == 2

    train_buffer = ReplayBuffer(train_target, cfg.adapt, "train")
    val_buffer = ReplayBuffer(val_target, cfg.adapt, "val")
    assert len(train_buffer) == 7
    assert len(val_buffer) == 3
    train_frames = [f["rgb"].stem for f in
                    train_buffer.target_data.frame_paths]
    val_frames = [f["rgb"].stem for f in val_buffer.target_data.frame_paths]
    assert train_frames == [f"{n:010d}" for n in range(1, 8)]
    assert val_frames == [f"{n:010d}" for n in (8, 9, 10)]


def test_source_sampling_exhausts_before_repeat(tmp_path):
    cfg = _adapt_cfg(tmp_path)
    buffer = _make_buffer(tmp_path, cfg)
    n_source = len(buffer.source_data)
    seen = []
    # each item consumes 2 source samples; a full cycle is n_source/2 items
    for i in range(n_source // 2):
        item = buffer[i % len(buffer)]
        del item
        pass
    # After exactly one pass the buffer resets; track manually instead:
    buffer2 = _make_buffer(tmp_path, cfg)
    picks = []
    for _ in range(n_source // 2):
        with buffer2.lock:
            picks.extend(buffer2._sample_source_indices().tolist())
    assert sorted(picks) == sorted(range(n_source))


def test_diversity_add_and_evict(tmp_path):
    cfg = _adapt_cfg(tmp_path, target_size=3)
    buffer = _make_buffer(tmp_path, cfg)

    # Nearly identical features -> only the first is admitted.
    base = RNG.normal(0, 1, (4, 6, 16)).astype(np.float32)
    buffer.add(0, base)
    buffer.add(1, base + 1e-4)
    assert buffer.buffer_indices["target"][0] == 1
    assert buffer.buffer_indices["target"][1] == 0

    # Distinct features fill the buffer, then evict the most redundant.
    for i, seed in zip(range(2, 6), range(4)):
        feats = np.random.default_rng(seed).normal(
            0, 1, (4, 6, 16)).astype(np.float32)
        buffer.add(i, feats)
    assert int(buffer.buffer_indices["target"].sum()) == 3
    assert buffer.sim_index.ntotal == 3


def test_buffer_save_load_state(tmp_path):
    cfg = _adapt_cfg(tmp_path, target_size=3)
    buffer = _make_buffer(tmp_path, cfg)
    for i in range(3):
        feats = np.random.default_rng(i).normal(
            0, 1, (4, 6, 16)).astype(np.float32)
        buffer.add(i, feats)
    state_path = str(tmp_path / "buffer_state.pkl")
    buffer.save_state(state_path)

    cfg2 = _adapt_cfg(tmp_path / "second", target_size=3)
    buffer2 = _make_buffer(tmp_path / "second", cfg2)
    prev_target = Kitti360("sequence", cfg.dataset, sequences=["03"],
                           sequence_reference_mode="rgb",
                           label_mode="codeps")
    buffer2.load_state(prev_target, state_path)
    assert len(buffer2.buffer_indices["prev_target"]) == 3
    assert all(idx >= 10000 for idx in buffer2.buffer_indices["prev_target"])
    assert buffer2.sim_index.ntotal == 3


# ------------------------------------------------------------------ mixup

def test_distance_transform_manhattan():
    mask = np.zeros((8, 10), np.float32)
    mask[4, 5] = 1
    dist = distance_transform_manhattan(mask)
    assert dist[4, 5] == 0
    assert dist[4, 7] == 2
    assert dist[0, 5] == 4
    assert dist[0, 0] == 9


def test_warp_c2c_identity():
    img = RNG.uniform(0, 1, (16, 20, 3)).astype(np.float32)
    intr = np.asarray([12.0, 12.0, 9.5, 7.5], np.float32)
    out = warp_c2c(intr, intr, img, (16, 20))
    np.testing.assert_allclose(out, img, atol=1e-4)


@pytest.mark.parametrize("strategy", ["cut_mixup", "class_mixup",
                                      "conf_instance_mixup"])
def test_do_mixup_strategies(strategy):
    height, width = 32, 48
    rng = np.random.default_rng(5)
    semantic_src = rng.integers(0, 9, (height, width)).astype(np.uint8)
    instance_src = np.zeros((height, width), np.int32)
    semantic_src[5:12, 5:15] = 11
    instance_src[5:12, 5:15] = 11001

    semantic_pred = rng.integers(0, 9, (height, width)).astype(np.int32)
    semantic_pred[20:30, 20:35] = 11
    center_pred = np.zeros((height, width, 1), np.float32)
    center_pred[25, 27, 0] = 1.0
    offset_pred = np.zeros((height, width, 2), np.float32)
    yy, xx = np.mgrid[0:height, 0:width]
    offset_pred[..., 0] = np.where(semantic_pred == 11, 25 - yy, 0)
    offset_pred[..., 1] = np.where(semantic_pred == 11, 27 - xx, 0)

    data = {
        "rgb_src": {0: rng.uniform(0, 1, (height, width, 3)).astype(np.float32)},
        "rgb_tgt": {0: rng.uniform(0, 1, (height, width, 3)).astype(np.float32)},
        "semantic_src": semantic_src,
        "instance_src": instance_src,
        "camera_model_src": np.asarray([30.0, 30.0, 24.0, 16.0], np.float32),
        "camera_model_tgt": np.asarray([28.0, 28.0, 24.0, 16.0], np.float32),
        "semantic_pred_tgt_ema": semantic_pred,
        "center_pred_tgt_ema": center_pred,
        "offset_pred_tgt_ema": offset_pred,
        "tgt_is_replay": 0,
    }

    from codeps_tpu.config import get_cfg_defaults_adapt
    cfg_mixup = get_cfg_defaults_adapt().adapt.mixup
    cfg_mixup.cut_mix.nof_vert_splits = 4
    cfg_mixup.cut_mix.nof_hor_splits = 2
    cfg_mixup.cut_mix.nof_segments = 2

    out = Mixup.do_mixup(strategy, data, thing_list=(9, 10, 11, 12, 13),
                         cfg_mixup=cfg_mixup,
                         rng=np.random.default_rng(0), num_classes=14)
    assert out["rgb"][0].shape == (height, width, 3)
    assert out["semantic"].shape == (height, width)
    assert out["center"].shape == (height, width, 1)
    assert out["offset"].shape == (height, width, 2)
    assert out["instance"].shape == (height, width)
    # mixed sample differs from pure source
    assert not np.array_equal(out["semantic"], semantic_src)


def test_fused_cut_mixup_matches_host_composition():
    """The in-jit cut composition (tasks/adapt.py) must match the host
    Mixup.cut_mixup + warp path for the same inputs and cells."""
    import jax.numpy as jnp

    from codeps_tpu.tasks.mixup_prep import c2c_grid
    from codeps_tpu.ops.grid_sample import grid_sample

    hs, ws = 32, 64
    ht, wt = 32, 96
    rng = np.random.default_rng(7)
    rgb_src = rng.uniform(0, 1, (hs, ws, 3)).astype(np.float32)
    rgb_tgt = rng.uniform(0, 1, (ht, wt, 3)).astype(np.float32)
    sem_tgt = rng.integers(0, 14, (ht, wt)).astype(np.int32)
    sem_src = rng.integers(0, 14, (hs, ws)).astype(np.int32)
    intr_src = np.asarray([28.0, 28.0, ws / 2, hs / 2], np.float32)
    intr_tgt = np.asarray([30.0, 30.0, wt / 2, ht / 2], np.float32)

    # host path: warp then compose with fixed cells
    rgb_w = warp_c2c(intr_tgt, intr_src, rgb_tgt, (hs, ws),
                     interp_mode="bilinear", padding_mode="zeros")
    sem_w = warp_c2c(intr_tgt, intr_src, sem_tgt.astype(np.float32),
                     (hs, ws), interp_mode="nearest",
                     padding_mode="border").astype(np.int32)

    cells = np.asarray([1, 6])
    nof_vert, nof_hor = 4, 2
    crop_h, crop_w = hs // nof_vert, ws // nof_hor
    mask = np.zeros((hs, ws), bool)
    for cell in cells:
        mx, my = cell % nof_hor, cell // nof_hor
        mask[my * crop_h:(my + 1) * crop_h - 1,
             mx * crop_w:(mx + 1) * crop_w - 1] = True
    host_rgb = rgb_src.copy()
    host_rgb[mask] = rgb_w[mask]
    host_sem = sem_src.copy()
    host_sem[mask] = sem_w[mask]

    # device path: c2c_grid + grid_sample + iota mask (same math as the
    # fused step)
    grid = c2c_grid(jnp.asarray(intr_tgt)[None], jnp.asarray(intr_src)[None],
                    (ht, wt), (hs, ws))
    dev_rgb_w = np.asarray(grid_sample(jnp.asarray(rgb_tgt)[None], grid,
                                       mode="bilinear",
                                       padding_mode="zeros"))[0]
    dev_sem_w = np.asarray(grid_sample(
        jnp.asarray(sem_tgt.astype(np.float32))[None, ..., None], grid,
        mode="nearest", padding_mode="border"))[0, ..., 0].astype(np.int32)

    np.testing.assert_allclose(dev_rgb_w, rgb_w, atol=1e-5)
    np.testing.assert_array_equal(dev_sem_w, sem_w)

    dev_rgb = np.where(mask[..., None], dev_rgb_w, rgb_src)
    dev_sem = np.where(mask, dev_sem_w, sem_src)
    np.testing.assert_allclose(dev_rgb, host_rgb, atol=1e-5)
    np.testing.assert_array_equal(dev_sem, host_sem)


def test_fused_class_mixup_matches_host_composition():
    """The in-jit class composition (tasks/adapt.py: replace-set lookup
    by SOURCE semantic class) must match the host Mixup.class_mixup for
    the same chosen classes (mixup.py:68-86)."""
    hs, ws = 24, 32
    rng = np.random.default_rng(11)
    rgb_src = rng.uniform(0, 1, (hs, ws, 3)).astype(np.float32)
    rgb_tgt_w = rng.uniform(0, 1, (hs, ws, 3)).astype(np.float32)
    sem_src = rng.integers(0, 14, (hs, ws)).astype(np.int32)
    sem_w = rng.integers(0, 14, (hs, ws)).astype(np.int32)
    inst_src = rng.integers(0, 3, (hs, ws)).astype(np.int32)
    inst_w = rng.integers(0, 3, (hs, ws)).astype(np.int32)

    # host path draws the replace-set from np.unique(semantic_src)
    host_rng = np.random.default_rng(5)
    host_rgb, host_sem, _ = Mixup.class_mixup(
        host_rng, rgb_src, rgb_tgt_w, inst_src, sem_src, sem_w, inst_w)

    # fused path: the runner draws the SAME classes with the same stream
    # and threads them as a 256-entry bool table (adapt_loop.py)
    dev_rng = np.random.default_rng(5)
    all_classes = np.unique(sem_src)
    num = all_classes.shape[0]
    chosen = all_classes[dev_rng.choice(num, (num + num % 2) // 2,
                                        replace=False)]
    table = np.zeros((256,), bool)
    table[chosen] = True
    mask = table[np.clip(sem_src, 0, 255)]   # the step's vmap lookup

    dev_rgb = np.where(mask[..., None], rgb_tgt_w, rgb_src)
    dev_sem = np.where(mask, sem_w, sem_src)
    np.testing.assert_allclose(dev_rgb, host_rgb, atol=1e-6)
    np.testing.assert_array_equal(dev_sem, host_sem)


def test_continual_chain_prev_target_sampling(tmp_path):
    """CS -> KITTI-360 -> SemKITTI continual chain: the second-domain
    buffer loads the first domain's saved state and serves prev_target
    replay samples through the +10000 index offset
    (datasets/replay_buffer.py:189-209,447-500)."""
    from codeps_tpu.data import SemKittiDvps
    from codeps_tpu.data.synthetic import make_semkitti_tree

    # phase 1: adapt on KITTI-360, fill + save the diversity buffer
    cfg1 = _adapt_cfg(tmp_path, target_size=3)
    buffer1 = _make_buffer(tmp_path, cfg1)
    for i in range(3):
        feats = np.random.default_rng(i).normal(
            0, 1, (4, 6, 16)).astype(np.float32)
        buffer1.add(i, feats)
    state_path = str(tmp_path / "k360_buffer.pkl")
    buffer1.save_state(state_path)

    # phase 2: adapt on SemKITTI with the KITTI-360 buffer as prev_target
    sk_root = make_semkitti_tree(tmp_path / "semkitti", num_frames=6)
    cfg2 = gen_config(adapt=True, freeze=False)
    cfg2.dataset.name = "sem_kitti_dvps"
    cfg2.dataset.path = str(sk_root)
    cfg2.dataset.feed_img_size = [32, 48]
    cfg2.dataset.center_heatmap_sigma = 4
    cfg2.adapt.source_dataset.name = "cityscapes"
    cfg2.adapt.source_dataset.path = str(tmp_path / "cs")
    cfg2.adapt.source_dataset.feed_img_size = [32, 48]
    cfg2.adapt.replay_sampler.nof_source_samples = 2
    cfg2.adapt.replay_sampler.nof_target_samples = 2
    cfg2.adapt.replay_buffer.maximize_diversity = True
    cfg2.adapt.replay_buffer.target_size = 3
    cfg2.adapt.mixup.general.active = False
    cfg2.freeze()

    target2 = SemKittiDvps("sequence", cfg2.dataset,
                           sequences=["07"], label_mode="codeps")
    buffer2 = ReplayBuffer(target2, cfg2.adapt, "train")
    source = Cityscapes("train", cfg2.adapt.source_dataset,
                        label_mode="codeps")
    buffer2.initialize_source_buffer(source, None)
    prev_target = Kitti360("sequence", cfg1.dataset, sequences=["03"],
                           sequence_reference_mode="rgb",
                           label_mode="codeps")
    buffer2.load_state(prev_target, state_path)

    # buffer2's own target buffer is empty -> replay must come from the
    # previous domain via the offset indices
    item = buffer2[0]
    assert "target_replay" in item
    assert len(item["target_replay"]) == 2
    for replay_item in item["target_replay"]:
        # prev-domain frames resolve through the K360 dataset at ITS
        # feed size
        assert replay_item["rgb"][0].shape[:2] == (32, 48)
    # the diversity features carried over
    assert buffer2.sim_index.ntotal == 3


def test_conf_instance_dt_vs_kornia_algo():
    """conf_instance_mixup paste offsets match the reference's kornia
    path (mixup.py:587-590): kornia_dist_row's closed form — exact
    Chebyshev ring index + the conv-chamfer sub-pixel tie-break — must
    reproduce a faithful reimplementation of kornia.contrib.
    distance_transform's published iterative algorithm (scripts/
    kornia_dt.py) value-for-value on the consumed row, hence select
    identical argmax paste offsets."""
    import importlib.util
    import pathlib

    from codeps_tpu.data.mixup import kornia_dist_row

    repo = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "kornia_dt", repo / "scripts" / "kornia_dt.py")
    kornia_dt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kornia_dt)

    rng = np.random.default_rng(7)
    for trial in range(60):
        h = int(rng.integers(6, 48))
        w = int(rng.integers(6, 96))
        mask = np.zeros((h, w), np.float32)
        for _ in range(int(rng.integers(0, 4))):  # 0 blobs = all-zero case
            y0 = int(rng.integers(0, max(h - 3, 1)))
            x0 = int(rng.integers(0, max(w - 3, 1)))
            mask[y0:y0 + int(rng.integers(2, 12)),
                 x0:x0 + int(rng.integers(2, 18))] = 1
        row = int(rng.integers(0, h))
        full = kornia_dt.kornia_distance_transform(mask)[row, :]
        ours = kornia_dist_row(mask, row)
        np.testing.assert_allclose(ours, full, atol=1e-5)
        assert int(np.argmax(ours)) == int(np.argmax(full))
