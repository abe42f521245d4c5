#!/usr/bin/env python3
"""Reorganize Cityscapes-DVPS (ViP-DeepLab) into the Cityscapes layout.

Parity: /root/reference/scripts/prepare_cityscapes_dvps.py. Inputs: the
Cityscapes-VPS dump (img + panoptic_inst) and the DVPS depth dump.
"""

import argparse
import multiprocessing as mp
import shutil
from functools import partial
from pathlib import Path


def copy_image(file_name: Path, out_path: Path, split: str) -> None:
    city = file_name.name.split("_")[2]
    new_name = "_".join(file_name.name.split("_")[2:]).replace("new",
                                                               "left")
    dst = out_path / "leftImg8bit" / split / city / new_name
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(file_name, dst)


def copy_gt(file_name: Path, out_path: Path, split: str) -> None:
    city = file_name.name.split("_")[2]
    new_name = "_".join(file_name.name.split("_")[2:])
    new_name = new_name.replace("final_mask", "gtFine_instanceIds")
    new_name = new_name.replace("gtFine_color", "gtFine_instanceIds")
    dst = out_path / "gtFine" / split / city / new_name
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(file_name, dst)


def copy_depth(file_name: Path, out_path: Path, split: str) -> None:
    city = file_name.name.split("_")[2]
    new_name = "_".join(file_name.name.split("_")[2:])
    dst = out_path / "depth" / split / city / new_name
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(file_name, dst)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--vps_path", required=True)
    parser.add_argument("--dvps_depth", required=True)
    parser.add_argument("--out_path", required=True)
    args = parser.parse_args()
    vps_path = Path(args.vps_path).absolute()
    dvps_depth = Path(args.dvps_depth).absolute()
    out_path = Path(args.out_path).absolute()

    for split in ("train", "val"):
        print(f"Process {split}...")
        img_files = sorted((vps_path / split / "img").glob("*.png"))
        gt_files = sorted((vps_path / split / "panoptic_inst").glob("*.png"))
        depth_files = sorted(
            (dvps_depth / "video_sequence" / split).glob("*.png"))

        workers = max(1, mp.cpu_count() - 1)
        with mp.Pool(processes=workers) as pool:
            pool.map(partial(copy_image, out_path=out_path, split=split),
                     img_files)
            pool.map(partial(copy_gt, out_path=out_path, split=split),
                     gt_files)
            pool.map(partial(copy_depth, out_path=out_path, split=split),
                     depth_files)


if __name__ == "__main__":
    main()
