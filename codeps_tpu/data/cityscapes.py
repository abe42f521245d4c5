"""Cityscapes dataset loader.

Parity: datasets/cityscapes.py (/root/reference/datasets/cityscapes.py):
frames keyed by gtFine labelIds files, RGB triplets from
leftImg8bit_sequence by filename arithmetic, per-frame camera JSON,
instance encoding semantic*1000+id with iscrowd (<1000) removal,
small-instance semantic upweighting, center/offset GT, and depth from
disparity + baseline.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List

import cv2
import numpy as np
from PIL import Image

from codeps_tpu.data.dataset import Dataset
from codeps_tpu.data.preprocessing import augment_data, prepare_for_network

# labelIds -> trainIds (cityscapes.py:266-323); codeps merges wall->building
# and motorcycle+bicycle->two-wheeler.
_MAPPING_CITYSCAPES = [
    (7, 0), (8, 1), (11, 2), (12, 3), (13, 4), (17, 5), (19, 6), (20, 7),
    (21, 8), (22, 9), (23, 10), (24, 11), (25, 12), (26, 13), (27, 14),
    (28, 15), (31, 16), (32, 17), (33, 18),
]
_MAPPING_CODEPS = [
    (7, 0), (8, 1), (11, 2), (12, 2), (13, 3), (17, 4), (20, 5), (21, 6),
    (22, 7), (23, 8), (24, 9), (25, 10), (26, 11), (27, 12), (32, 13),
    (33, 13),
]


class Cityscapes(Dataset):

    def __init__(self, mode: str, cfg, return_depth: bool = False,
                 return_only_rgb: bool = False, label_mode: str = "codeps"):
        super().__init__("cityscapes", ["train", "val"], mode, cfg,
                         return_depth, return_only_rgb, label_mode)
        self.frame_paths = self._get_frames()
        if self.return_only_rgb:
            self.frame_paths = self._get_frames_only_rgb()

    # ------------------------------------------------------------------

    def _get_frames(self) -> List[Dict[str, Path]]:
        semantic_files = sorted(
            (self.path_base / "gtFine" / self.mode).glob(
                "*/*_gtFine_labelIds.png"))
        frames = []
        for semantic in semantic_files:
            file_base = semantic.stem.replace("_gtFine_labelIds", "")
            city = file_base.split("_")[0]
            rgb = (self.path_base / "leftImg8bit_sequence" / self.mode /
                   city / f"{file_base}_leftImg8bit.png")
            instance = semantic.parent / semantic.name.replace("label",
                                                               "instance")
            camera = (self.path_base / "camera" / self.mode / city /
                      f"{file_base}_camera.json")
            disparity = (self.path_base / "disparity_sequence" / self.mode /
                         city / f"{file_base}_disparity.png"
                         if self.return_depth else None)
            frame = {"rgb": rgb, "semantic": semantic, "instance": instance,
                     "camera": camera, "disparity": disparity}
            for path in frame.values():
                if path is not None:
                    assert path.exists(), f"File does not exist: {path}"
            frames.append(frame)
        return frames

    def _get_frames_only_rgb(self) -> List[Dict[str, Path]]:
        """Expand to full sequences for depth-only training
        (cityscapes.py:67-110)."""
        frames = []
        max_offset = max(self.offsets)
        for frame in self.frame_paths:
            image = frame["rgb"]
            center_number = image.stem.split("_")[2]
            digits = len(center_number)
            sequence_files = []
            for direction in (-1, 1):
                i = direction
                while True:
                    number = int(center_number) + i
                    path = image.parent / image.name.replace(
                        center_number, str(number).zfill(digits))
                    if path.exists():
                        sequence_files.append(path)
                        i += direction
                    else:
                        break
            sequence_files.sort()
            sequence_files = sequence_files[max_offset:-max_offset]
            for file in sequence_files:
                disparity = None
                if self.return_depth:
                    disparity = Path(
                        str(file).replace("leftImg8bit", "disparity"))
                    assert disparity.exists(), f"Missing: {disparity}"
                frames.append({"rgb": file, "camera": frame["camera"],
                               "disparity": disparity})
        return frames

    # ------------------------------------------------------------------

    def __getitem__(self, index: int, do_network_preparation: bool = True,
                    do_augmentation: bool = True,
                    return_only_rgb: bool = False) -> Dict[str, Any]:
        image_path = self.frame_paths[index]["rgb"]
        image = Image.open(image_path).convert("RGB")
        image_size = image.size  # (W, H)
        images = {0: self.resize(image)}
        center_number = image_path.stem.split("_")[2]
        digits = len(center_number)
        for offset in self.offsets:
            number = int(center_number) + offset
            path = image_path.parent / image_path.name.replace(
                center_number, str(number).zfill(digits))
            assert path.exists(), f"Offset file does not exist: {path}"
            images[offset] = self.resize(Image.open(path).convert("RGB"))

        with open(self.frame_paths[index]["camera"], "r",
                  encoding="utf-8") as handle:
            camera_data = json.load(handle)
        intr = camera_data["intrinsic"]
        height, width = self.image_size
        scale_u = width / image_size[0]
        scale_v = height / image_size[1]
        camera_model = np.asarray(
            [intr["fx"] * scale_u, intr["fy"] * scale_v,
             intr["u0"] * scale_u, intr["v0"] * scale_v], np.float32)

        output: Dict[str, Any] = {"rgb": images, "camera_model": camera_model}

        if not (self.return_only_rgb or return_only_rgb):
            semantic = cv2.imread(str(self.frame_paths[index]["semantic"]),
                                  cv2.IMREAD_GRAYSCALE)
            semantic = cv2.resize(semantic, (width, height),
                                  interpolation=cv2.INTER_NEAREST)
            instance = cv2.imread(str(self.frame_paths[index]["instance"]),
                                  cv2.IMREAD_ANYDEPTH)
            instance = cv2.resize(instance, (width, height),
                                  interpolation=cv2.INTER_NEAREST)

            semantic_city = self._convert_semantics(semantic)

            # instance ids: train_class*1000 + per-class id; iscrowd
            # (raw id < 1000) removed (cityscapes.py:189-198).
            class_instance = instance.astype(np.int64) - \
                semantic.astype(np.int64) * 1000
            thing_mask = self._make_thing_mask(semantic_city, as_bool=True)
            instance_msk = thing_mask.copy()
            instance_msk[instance < 1000] = False
            instance_city = np.zeros_like(instance, dtype=np.uint16)
            instance_city[instance_msk] = (
                semantic_city[instance_msk].astype(np.int64) * 1000
                + class_instance[instance_msk]).astype(np.uint16)

            semantic_weights = np.ones_like(instance_city, dtype=np.uint8)
            semantic_weights[semantic_city == 255] = 0

            full_res_w, full_res_h = image_size
            small_instance_area = (self.small_instance_area_full_res
                                   * (height / full_res_h)
                                   * (width / full_res_w))
            inst_id, inst_area = np.unique(instance_city, return_counts=True)
            for instance_id, instance_area in zip(inst_id, inst_area):
                if instance_id == 0:
                    continue
                if instance_area < small_instance_area:
                    semantic_weights[instance_city == instance_id] = \
                        self.small_instance_weight

            offset, center = self.get_offset_center(instance_city)

            center_weights = np.ones_like(center, dtype=np.uint8)
            center_weights[semantic_city == 255] = 0
            offset_weights = instance_msk.astype(np.uint8)[..., None]

            output.update({
                "semantic": semantic_city,
                "semantic_weights": semantic_weights,
                "center": center,
                "center_weights": center_weights,
                "offset": offset,
                "offset_weights": offset_weights,
                "thing_mask": thing_mask.astype(np.uint8),
                "instance": instance_city.astype(np.int32),
            })

        if self.return_depth:
            disparity = cv2.imread(str(self.frame_paths[index]["disparity"]),
                                   cv2.IMREAD_UNCHANGED).astype(np.float32)
            disparity[disparity > 0] = (disparity[disparity > 0] - 1) / 256
            focal_length_x = camera_data["intrinsic"]["fx"]
            baseline = camera_data["extrinsic"]["baseline"]
            depth = np.zeros_like(disparity)
            depth[disparity > 0] = (baseline * focal_length_x) / \
                disparity[disparity > 0]
            depth = cv2.resize(depth, (width, height),
                               interpolation=cv2.INTER_NEAREST)
            output["depth"] = depth

        if do_augmentation:
            augment_data(output, self.augmentation_cfg)
        if do_network_preparation:
            prepare_for_network(output, self.normalization_cfg)
        return output

    def _convert_semantics(self, semantic: np.ndarray) -> np.ndarray:
        mapping = (_MAPPING_CITYSCAPES if self.label_mode == "cityscapes"
                   else _MAPPING_CODEPS)
        return self._apply_mapping(semantic, mapping)
