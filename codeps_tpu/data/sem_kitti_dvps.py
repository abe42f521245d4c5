"""SemanticKITTI-DVPS dataset loader.

Parity: datasets/sem_kitti_dvps.py (/root/reference/datasets/
sem_kitti_dvps.py): ViP-DeepLab splits (train 00-10 minus 08, val 08),
frames keyed by 16-bit depth PNGs (value/256 metric depth), calibration
from calib.txt P2, and KITTI->codeps/cityscapes label maps
(bicyclist/motorcyclist -> rider, parking -> road, trunk -> vegetation).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import cv2
import numpy as np
from PIL import Image

from codeps_tpu.data.dataset import Dataset
from codeps_tpu.data.preprocessing import augment_data, prepare_for_network

_MAPPING_CITYSCAPES = [
    (8, 0), (10, 1), (12, 2), (13, 4), (17, 5), (18, 7), (14, 8), (16, 9),
    (5, 11), (6, 12), (7, 12), (0, 13), (3, 14), (2, 17), (1, 18),
    (9, 0),    # parking -> road
    (15, 8),   # trunk -> vegetation
]
_MAPPING_CODEPS = [
    (8, 0), (9, 0), (10, 1), (12, 2), (13, 3), (17, 4), (18, 5), (14, 6),
    (15, 6), (16, 7), (5, 9), (6, 10), (7, 10), (0, 11), (3, 12), (2, 13),
    (1, 13),
]

_TRAIN_SEQUENCES = ["00", "02", "03", "04", "05", "06", "07", "09", "10"]
_VALID_SEQUENCES = _TRAIN_SEQUENCES + ["08"]


class SemKittiDvps(Dataset):

    def __init__(self, mode: str, cfg, return_depth: bool = False,
                 return_only_rgb: bool = False,
                 sequences: Optional[List[str]] = None,
                 label_mode: str = "codeps"):
        super().__init__("sem_kitti_dvps", ["train", "val", "sequence"],
                         mode, cfg, return_depth, return_only_rgb,
                         label_mode)
        if mode == "sequence":
            assert sequences, "In 'sequence' mode, sequences must be given."
            for seq in sequences:
                assert seq in _VALID_SEQUENCES, f"Invalid sequence: {seq}"

        if self.mode == "train":
            self.sequences = list(_TRAIN_SEQUENCES)
        elif self.mode == "val":
            self.sequences = ["08"]
        else:
            self.sequences = sequences
        self.frame_paths = self._get_frames()

    def _get_frames(self) -> List[Dict[str, Any]]:
        depth_files = []
        for sequence in self.sequences:
            seq_files = sorted(
                (self.path_base / "data_2d_depth" / sequence).glob("*.png"))
            seq_files = seq_files[max(self.offsets):-max(self.offsets)]
            depth_files += seq_files

        frames = []
        for depth in depth_files:
            sequence = depth.parent.name
            frame_id = depth.name.split("_")[0]
            rgb = (self.path_base / "data_2d_raw" / sequence / "image_2" /
                   f"{frame_id}.png")
            camera = self.path_base / "data_2d_raw" / sequence / "calib.txt"
            semantic = (self.path_base / "data_2d_semantics" / sequence /
                        f"{frame_id}_class.png")
            instance = (self.path_base / "data_2d_semantics" / sequence /
                        f"{frame_id}_instance.png")
            frame = {"rgb": rgb, "semantic": semantic, "instance": instance,
                     "camera": camera,
                     "depth": depth if self.return_depth else None}
            for path in frame.values():
                if path is not None:
                    assert path.exists(), f"File does not exist: {path}"
            frames.append(frame)
        return frames

    def __getitem__(self, index: int, do_network_preparation: bool = True,
                    do_augmentation: bool = True,
                    return_only_rgb: bool = False) -> Dict[str, Any]:
        image_path = self.frame_paths[index]["rgb"]
        image = Image.open(image_path).convert("RGB")
        image_size = image.size
        images = {0: self.resize(image)}
        center_number = image_path.stem
        digits = len(center_number)
        for offset in self.offsets:
            number = int(center_number) + offset
            path = image_path.parent / f"{str(number).zfill(digits)}.png"
            assert path.exists(), f"Offset file does not exist: {path}"
            images[offset] = self.resize(Image.open(path).convert("RGB"))

        with open(self.frame_paths[index]["camera"], "r",
                  encoding="utf-8") as handle:
            camera_data = handle.readlines()[2].replace("P2: ", "").split(" ")
            camera_data = [float(value) for value in camera_data]
        height, width = self.image_size
        scale_u = width / image_size[0]
        scale_v = height / image_size[1]
        camera_model = np.asarray(
            [camera_data[0] * scale_u, camera_data[5] * scale_v,
             camera_data[2] * scale_u, camera_data[6] * scale_v], np.float32)

        output: Dict[str, Any] = {"rgb": images, "camera_model": camera_model}

        if not (self.return_only_rgb or return_only_rgb):
            semantic = cv2.imread(str(self.frame_paths[index]["semantic"]),
                                  cv2.IMREAD_ANYDEPTH)
            semantic = cv2.resize(semantic, (width, height),
                                  interpolation=cv2.INTER_NEAREST)
            instance = cv2.imread(str(self.frame_paths[index]["instance"]),
                                  cv2.IMREAD_ANYDEPTH)
            instance = cv2.resize(instance, (width, height),
                                  interpolation=cv2.INTER_NEAREST)

            semantic_city = self._convert_semantics(semantic)
            instance_city = instance.copy()
            instance_city[semantic_city == 255] = 0

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

            # Reference quirk preserved: SemKITTI calls the static
            # helper WITHOUT self.sigma/self.gaussian
            # (sem_kitti_dvps.py:168), so its center heatmaps always use
            # the default sigma=8 even when center_heatmap_sigma is
            # configured differently (Cityscapes/KITTI-360 pass the
            # configured values explicitly).
            from codeps_tpu.data.dataset import \
                get_offset_center as _default_offset_center
            offset, center = _default_offset_center(instance_city)

            center_weights = np.ones_like(center, dtype=np.uint8)
            center_weights[semantic_city == 255] = 0
            offset_weights = self._make_thing_mask(semantic_city)[..., None]

            output.update({
                "semantic": semantic_city,
                "semantic_weights": semantic_weights,
                "center": center,
                "center_weights": center_weights,
                "offset": offset,
                "offset_weights": offset_weights,
                # Reference re-uses offset_weights as the thing mask here
                # (sem_kitti_dvps.py:185); collate/loss contract is
                # (H, W) like the other loaders, so drop the channel dim.
                "thing_mask": offset_weights[..., 0],
                "instance": instance_city.astype(np.int32),
            })

            if self.return_depth:
                depth = cv2.imread(str(self.frame_paths[index]["depth"]),
                                   cv2.IMREAD_ANYDEPTH).astype(np.float32)
                depth[depth > 0] /= 256
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

    @property
    def ignore_classes(self) -> List[int]:
        """Cityscapes classes absent in KITTI (sem_kitti_dvps.py:270-278)."""
        if self.label_mode == "cityscapes":
            return [3, 6, 10, 15, 16]
        if self.label_mode == "codeps":
            return []
        raise ValueError(f"Unsupported label mode: {self.label_mode}")
