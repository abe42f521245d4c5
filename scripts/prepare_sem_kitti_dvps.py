#!/usr/bin/env python3
"""Reorganize SemKITTI-DVPS annotations + KITTI odometry into the layout
expected by the SemKittiDvps loader (data_2d_{raw,semantics,depth}).

Parity: /root/reference/scripts/prepare_sem_kitti_dvps.py:17-70. Inputs:
the ViP-DeepLab semkitti-dvps annotation dump and the KITTI odometry
'dataset/sequences' tree.
"""

import argparse
import multiprocessing as mp
import shutil
from functools import partial
from pathlib import Path


def copy_depth(file_name: Path, out_path: Path) -> None:
    sequence = int(file_name.name.split("_")[0])
    new_name = "_".join(file_name.name.split("_")[1:]).replace("_depth", "")
    dst = out_path / "data_2d_depth" / f"{sequence:02}" / new_name
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(file_name, dst)


def copy_semantics(file_name: Path, out_path: Path) -> None:
    sequence = int(file_name.name.split("_")[0])
    new_name = "_".join(file_name.name.split("_")[1:]).replace("_gtFine", "")
    dst = out_path / "data_2d_semantics" / f"{sequence:02}" / new_name
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy(file_name, dst)


def copy_images(sequence_dir: Path, out_path: Path) -> None:
    sequence = int(sequence_dir.name)
    if sequence > 10:
        return
    dst_path = out_path / "data_2d_raw" / f"{sequence:02}"
    dst_path.mkdir(parents=True, exist_ok=True)
    for file_name in ("calib.txt", "times.txt"):
        shutil.copy(sequence_dir / file_name, dst_path / file_name)
    shutil.copytree(sequence_dir / "image_2", dst_path / "image_2",
                    dirs_exist_ok=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--in_path", required=True)
    parser.add_argument("--out_path", required=True)
    args = parser.parse_args()
    in_path = Path(args.in_path).absolute()
    out_path = Path(args.out_path).absolute()

    for split in ("train", "val"):
        print(f"Process {split}...")
        dvps_path = (in_path / "semkitti-dvps-annotations" /
                     "video_sequence" / split)
        depth_files = sorted(dvps_path.glob("*depth*.png"))
        semantic_files = sorted(dvps_path.glob("*gtFine*.png"))
        sequences = sorted((in_path / "dataset" / "sequences").glob("*"))

        workers = max(1, mp.cpu_count() - 1)
        with mp.Pool(processes=workers) as pool:
            pool.map(partial(copy_depth, out_path=out_path), depth_files)
            pool.map(partial(copy_semantics, out_path=out_path),
                     semantic_files)
            if split == "train":
                pool.map(partial(copy_images, out_path=out_path), sequences)


if __name__ == "__main__":
    main()
