#!/usr/bin/env python3
"""Compute the per-class pixel distribution used by rare-class replay
sampling.

The reference ships a precomputed cityscapes_class_distribution.pkl; the
replay buffer reads ``<dataset>/class_distribution.pkl`` with keys
{num_pixels, class_images, images_num_pixels}
(datasets/replay_buffer.py:339-368). This script generates that file for
any supported dataset/config.
"""

import argparse
import pickle
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--filename_config", required=True,
                        help="Training YAML (dataset section is used)")
    parser.add_argument("--split", default="train")
    parser.add_argument("--out", default=None,
                        help="Output path (default: "
                             "<dataset.path>/class_distribution.pkl)")
    args = parser.parse_args()

    from codeps_tpu.config import gen_config
    from codeps_tpu.data import Cityscapes, Kitti360, SemKittiDvps

    cfg = gen_config(args.filename_config)
    name = cfg.dataset.name
    builders = {"cityscapes": Cityscapes, "kitti_360": Kitti360,
                "sem_kitti_dvps": SemKittiDvps}
    dataset = builders[name](args.split, cfg.dataset,
                             label_mode=cfg.dataset.label_mode)

    num_pixels = defaultdict(int)
    class_images = defaultdict(list)
    images_num_pixels = defaultdict(dict)

    for index in range(len(dataset)):
        # Full __getitem__ also decodes+resizes RGB and builds GT maps
        # that we discard — acceptable for this run-once-per-dataset
        # script; only sample["semantic"] is consumed below.
        sample = dataset.__getitem__(index, do_network_preparation=False,
                                     do_augmentation=False)
        semantic = np.asarray(sample["semantic"])
        classes, counts = np.unique(semantic, return_counts=True)
        for cls, count in zip(classes, counts):
            cls = int(cls)
            if cls == 255:
                continue
            num_pixels[cls] += int(count)
            class_images[cls].append(index)
            images_num_pixels[index][cls] = int(count)
        if (index + 1) % 50 == 0:
            print(f"{index + 1}/{len(dataset)}")

    out_path = args.out or str(Path(cfg.dataset.path) /
                               "class_distribution.pkl")
    with open(out_path, "wb") as handle:
        pickle.dump({
            "num_pixels": dict(num_pixels),
            "class_images": dict(class_images),
            "images_num_pixels": dict(images_num_pixels),
        }, handle)
    print(f"Wrote {out_path}: {len(num_pixels)} classes, "
          f"{len(images_num_pixels)} images")


if __name__ == "__main__":
    main()
