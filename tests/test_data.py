"""Data pipeline tests: GT generation parity + full loaders on synthetic
dataset trees."""

import random

import numpy as np
import pytest

from codeps_tpu.config import get_cfg_defaults, get_cfg_defaults_adapt
from codeps_tpu.data.dataset import get_offset_center, make_center_gaussian
from codeps_tpu.data.loader import collate_batch
from codeps_tpu.data.preprocessing import (is_low_contrast, match_histograms,
                                           transfer_histogram_style)
from codeps_tpu.data.synthetic import (make_cityscapes_tree,
                                       make_kitti360_tree,
                                       make_semkitti_tree)

RNG = np.random.default_rng(31)


def _ref_get_offset_center(instance, sigma=8):
    """Reference oracle: datasets/dataset.py:125-177 (torch-free numpy),
    re-executed via importlib without the torch-dependent class."""
    import importlib.util
    import sys
    import types

    # dataset.py imports torch/torchvision at module level; extract just
    # the staticmethod by executing the source with stubs.
    stub_torch_data = types.ModuleType("torch.utils.data")
    class _StubTorchDataset:
        pass
    stub_torch_data.Dataset = _StubTorchDataset
    stub_torch = types.ModuleType("torch")
    stub_torch.utils = types.ModuleType("torch.utils")
    stub_torch.utils.data = stub_torch_data
    stub_tv = types.ModuleType("torchvision")
    stub_tv.transforms = types.ModuleType("transforms")
    stub_tv.transforms.Resize = lambda *a, **k: None
    stub_tv.transforms.InterpolationMode = types.SimpleNamespace(LANCZOS=1)
    stub_yacs = types.ModuleType("yacs.config")
    stub_yacs.CfgNode = dict
    saved = {}
    for name, mod in [("torch", stub_torch),
                      ("torch.utils", stub_torch.utils),
                      ("torch.utils.data", stub_torch_data),
                      ("torchvision", stub_tv),
                      ("torchvision.transforms", stub_tv.transforms),
                      ("yacs", types.ModuleType("yacs")),
                      ("yacs.config", stub_yacs)]:
        saved[name] = sys.modules.get(name)
        sys.modules[name] = mod
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_dataset", "/root/reference/datasets/dataset.py")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        offset, center = module.Dataset.get_offset_center(instance, sigma)
    finally:
        for name, mod in saved.items():
            if mod is None:
                del sys.modules[name]
            else:
                sys.modules[name] = mod
    return offset, center


def test_get_offset_center_matches_reference():
    instance = np.zeros((40, 56), np.uint16)
    instance[5:15, 8:20] = 9001
    instance[20:32, 30:50] = 11002
    instance[35:39, 2:5] = 9003
    ref_offset, ref_center = _ref_get_offset_center(instance, sigma=8)
    offset, center = get_offset_center(instance, sigma=8)
    # reference layout: offset (2, H, W) (dy, dx), center (1, H, W)
    np.testing.assert_allclose(center[..., 0], ref_center[0], atol=1e-6)
    np.testing.assert_allclose(offset[..., 0], ref_offset[0], atol=1e-5)
    np.testing.assert_allclose(offset[..., 1], ref_offset[1], atol=1e-5)


def test_center_gaussian_matches_reference_formula():
    sigma = 8
    gauss = make_center_gaussian(sigma)
    size = 6 * sigma + 3
    assert gauss.shape == (size, size)
    assert gauss[3 * sigma + 1, 3 * sigma + 1] == 1.0


def test_match_histograms_against_skimage_semantics():
    src = RNG.integers(0, 255, (32, 40, 3), np.uint8)
    ref = RNG.integers(0, 255, (32, 40, 3), np.uint8)
    out = match_histograms(src, ref)
    # matched image's sorted values should approximate reference's
    for c in range(3):
        src_sorted = np.sort(out[..., c].ravel())
        ref_sorted = np.sort(ref[..., c].ravel())
        assert np.abs(src_sorted.astype(int)
                      - ref_sorted.astype(int)).mean() < 3


def test_transfer_histogram_style_modes():
    from PIL import Image
    img = Image.fromarray(RNG.integers(0, 255, (24, 32, 3), np.uint8), "RGB")
    ref = Image.fromarray(RNG.integers(0, 255, (24, 32, 3), np.uint8), "RGB")
    for mode in ("rgb", "hsv", "saturation", None):
        out = transfer_histogram_style(img, ref, mode)
        assert out.size == img.size


def test_is_low_contrast():
    flat = np.full((20, 20, 3), 128, np.uint8)
    assert is_low_contrast(flat)
    noisy = RNG.integers(0, 255, (20, 20, 3), np.uint8)
    assert not is_low_contrast(noisy)


# ------------------------------------------------------------ loaders

def test_cityscapes_loader_end_to_end(tmp_path):
    root = make_cityscapes_tree(tmp_path / "cs", num_frames=3)
    cfg = get_cfg_defaults().dataset
    cfg.defrost() if cfg.is_frozen() else None
    cfg.name = "cityscapes"
    cfg.path = str(root)
    cfg.feed_img_size = [32, 48]
    cfg.center_heatmap_sigma = 4

    from codeps_tpu.data import Cityscapes
    ds = Cityscapes("train", cfg, return_depth=True, label_mode="codeps")
    assert len(ds) == 3
    sample = ds[0]
    assert sample["rgb"][0].shape == (32, 48, 3)
    assert sample["rgb"][-1].shape == (32, 48, 3)
    assert sample["semantic"].shape == (32, 48)
    assert sample["center"].shape == (32, 48, 1)
    assert sample["offset"].shape == (32, 48, 2)
    assert sample["depth"].shape == (32, 48)
    assert sample["camera_model"].shape == (4,)
    # codeps label range
    sem = sample["semantic"]
    assert set(np.unique(sem)).issubset(set(range(14)) | {255})

    batch = collate_batch([ds[0], ds[1]], offsets=[1])
    assert batch["frames"].shape == (2, 3, 32, 48, 3)
    assert batch["camera"].shape == (2, 4)
    assert batch["depth_gt"].shape == (2, 32, 48)


def test_cityscapes_flip_augmentation_consistency(tmp_path):
    root = make_cityscapes_tree(tmp_path / "cs2", num_frames=1)
    cfg = get_cfg_defaults().dataset
    cfg.name = "cityscapes"
    cfg.path = str(root)
    cfg.feed_img_size = [32, 48]
    cfg.center_heatmap_sigma = 4
    from codeps_tpu.data import Cityscapes
    ds = Cityscapes("train", cfg, label_mode="codeps")

    plain = ds.__getitem__(0, do_augmentation=False)
    random.seed(1)  # force flip branch deterministically
    flipped_any = False
    for seed in range(20):
        random.seed(seed)
        aug = ds.__getitem__(0, do_augmentation=True)
        if not np.array_equal(aug["semantic"], plain["semantic"]):
            flipped_any = True
            np.testing.assert_array_equal(aug["semantic"],
                                          plain["semantic"][:, ::-1])
            # offset x channel negated under flip
            np.testing.assert_allclose(aug["offset"][..., 1],
                                       -plain["offset"][:, ::-1, 1])
            break
    assert flipped_any, "No flip occurred in 20 seeded attempts"


def test_kitti360_sequence_loader(tmp_path):
    root = make_kitti360_tree(tmp_path / "k360", sequence="03", num_frames=6)
    cfg = get_cfg_defaults_adapt().dataset
    cfg.name = "kitti_360"
    cfg.path = str(root)
    cfg.feed_img_size = [32, 48]
    cfg.center_heatmap_sigma = 4

    from codeps_tpu.data import Kitti360
    ds = Kitti360("sequence", cfg, sequences=["03"],
                  sequence_reference_mode="rgb", label_mode="codeps")
    assert len(ds) > 0
    sample = ds[0]
    assert sample["rgb"][0].shape == (32, 48, 3)
    assert "semantic" in sample  # synthetic tree has semantics everywhere
    assert "semantic_eval" in sample


def test_semkitti_loader(tmp_path):
    root = make_semkitti_tree(tmp_path / "sk", sequence="07", num_frames=5)
    cfg = get_cfg_defaults_adapt().dataset
    cfg.name = "sem_kitti_dvps"
    cfg.path = str(root)
    cfg.feed_img_size = [32, 48]
    cfg.center_heatmap_sigma = 4

    from codeps_tpu.data import SemKittiDvps
    ds = SemKittiDvps("sequence", cfg, sequences=["07"], return_depth=True,
                      label_mode="codeps")
    assert len(ds) == 5
    sample = ds[0]
    assert sample["depth"].shape == (32, 48)
    assert sample["semantic"].shape == (32, 48)
    assert ds.ignore_classes == []


def test_dataloader_iterates(tmp_path):
    root = make_cityscapes_tree(tmp_path / "cs3", num_frames=4)
    cfg = get_cfg_defaults().dataset
    cfg.name = "cityscapes"
    cfg.path = str(root)
    cfg.feed_img_size = [32, 48]
    cfg.center_heatmap_sigma = 4
    from codeps_tpu.data import Cityscapes, DataLoader
    ds = Cityscapes("train", cfg, label_mode="codeps")
    loader = DataLoader(ds, batch_size=2, offsets=[1], shuffle=True, seed=3)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["frames"].shape == (2, 3, 32, 48, 3)


def test_dataloader_shards_have_equal_batch_counts():
    # DistributedSampler-style wrap padding: unequal per-host batch
    # counts leave one host running an extra step whose cross-process
    # collectives never complete (end-of-epoch multi-host deadlock).
    from codeps_tpu.data import DataLoader

    class _Dummy:
        def __len__(self):
            return 2975  # Cityscapes train size; not divisible by 2/3/8

    for num_shards in (2, 3, 8):
        lens, all_indices = [], []
        for shard in range(num_shards):
            loader = DataLoader(_Dummy(), batch_size=8, offsets=[1],
                                shuffle=True, seed=5,
                                shard_index=shard, num_shards=num_shards)
            idx = loader._indices()
            lens.append(len(idx))
            all_indices.append(idx)
        assert len(set(lens)) == 1, lens
        union = np.unique(np.concatenate(all_indices))
        assert len(union) == 2975  # every sample covered despite padding


def test_dataloader_early_stop_releases_producer():
    # A consumer that breaks early (max_batches caps) must not leave the
    # producer thread parked forever in a blocking queue.put.
    import threading
    import time

    from codeps_tpu.data import DataLoader

    sample = {"rgb": {0: np.zeros((4, 6, 3), np.float32),
                      -1: np.zeros((4, 6, 3), np.float32),
                      1: np.zeros((4, 6, 3), np.float32)},
              "camera_model": np.ones(4, np.float32)}

    class _Dummy:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return dict(sample)

    loader = DataLoader(_Dummy(), batch_size=2, offsets=[1],
                        shuffle=False, prefetch=2)
    baseline = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> finally -> stop.set()
    deadline = time.time() + 10
    while threading.active_count() > baseline and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= baseline, \
        "producer thread still alive after consumer closed"


def test_dataloader_multiprocess_matches_threaded(tmp_path):
    """num_workers>0 (forked worker processes, the reference's
    DataLoader(num_workers=N) equivalent) must produce the same batches
    as the in-process path for a deterministic (augmentation-off)
    dataset."""
    root = make_cityscapes_tree(tmp_path / "cs_mp", num_frames=4)
    cfg = get_cfg_defaults().dataset
    cfg.name = "cityscapes"
    cfg.path = str(root)
    cfg.feed_img_size = [32, 48]
    cfg.center_heatmap_sigma = 4
    cfg.augmentation.active = False
    from codeps_tpu.data import Cityscapes, DataLoader
    ds = Cityscapes("train", cfg, label_mode="codeps")
    threaded = list(DataLoader(ds, batch_size=2, offsets=[1], shuffle=True,
                               seed=3))
    multi = list(DataLoader(ds, batch_size=2, offsets=[1], shuffle=True,
                            seed=3, num_workers=2))
    assert len(threaded) == len(multi)
    for bt, bm in zip(threaded, multi):
        assert sorted(bt.keys()) == sorted(bm.keys())
        for key in bt:
            np.testing.assert_array_equal(np.asarray(bt[key]),
                                          np.asarray(bm[key]))
