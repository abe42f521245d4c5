"""Replay buffer: the online-adaptation dataset.

Parity: datasets/replay_buffer.py (/root/reference/datasets/
replay_buffer.py:23-524):
  - target stream split at target_dataset_adapt_ratio into adapt/val,
  - per-item assembly of {target (+low-contrast flag), N source samples
    (histogram-matched to the target, then augmented), augmented target,
    N target-replay samples, mixup raw materials},
  - exhaust-before-repeat source sampling,
  - rare-class source-buffer initialization (softmax((1-freq)/T), T=0.01,
    pixel-count-weighted image choice),
  - diversity-maximizing add/evict: normalized mean-pooled features in an
    inner-product index; insert iff max cosine similarity <
    similarity_threshold; on overflow evict argmax of summed pairwise
    similarity via an incrementally maintained matrix,
  - save_state/load_state for multi-domain continual chains with
    prev_target ids offset by +10000.

Host-side; the feed threads of the loader share this object, so a
threading.Lock replaces the reference's mp.Array/mp.Lock (the reference's
worker processes forced shared memory; threads don't).
"""

from __future__ import annotations

import copy
import pickle
import threading
from typing import Any, Dict, List, Optional

import numpy as np

from codeps_tpu.data.preprocessing import (augment_data, is_low_contrast,
                                           prepare_for_network,
                                           transfer_histogram_style)
from codeps_tpu.native.simindex import SimIndex

PREV_TARGET_OFFSET = 10000


class ReplayBuffer:

    def __init__(self, adaptation_data, cfg, mode: str):
        assert mode in ("train", "val"), f"Unsupported mode: {mode}"
        self.target_data = adaptation_data
        self.source_data = None
        self.mode = mode

        skipped = sum(getattr(self.target_data,
                              "semantic_seq_mode_image_skipped", []))
        index = int((len(self.target_data) + skipped)
                    * cfg.target_dataset_adapt_ratio)
        if self.mode == "train":
            self.target_data.frame_paths = \
                self.target_data.frame_paths[:index]
        else:
            if getattr(self.target_data, "sequence_reference_mode",
                       "rgb") != "rgb":
                index -= sum(self.target_data
                             .semantic_seq_mode_image_skipped[:index])
            self.target_data.frame_paths = \
                self.target_data.frame_paths[index:]

        self.source_num_samples = cfg.replay_sampler.nof_source_samples
        self.target_num_samples = cfg.replay_sampler.nof_target_samples
        self.samplers_seed = cfg.replay_sampler.seed
        self.buffer_seed = cfg.replay_buffer.seed

        self.buffer_indices: Dict[str, Any] = {
            "target": np.zeros(len(self.target_data), np.int32)}
        self.source_samples_indices: List[int] = []
        self.lock = threading.Lock()

        if cfg.replay_buffer.target_size is not None:
            self.target_buffer_size = cfg.replay_buffer.target_size
        else:
            self.target_buffer_size = len(self.target_data)
        self.maximize_diversity = cfg.replay_buffer.maximize_diversity
        self.similarity_threshold = cfg.replay_buffer.similarity_threshold
        self.sim_index: Optional[SimIndex] = None
        self.distance_matrix = None
        self.distance_matrix_indices = None
        self.buffer_remove_sampler = np.random.default_rng(self.buffer_seed)

        self.source_sampler = np.random.default_rng(self.samplers_seed)
        self.target_sampler = np.random.default_rng(self.samplers_seed)
        self.mixup_sampler = np.random.default_rng(self.samplers_seed)

        self.cfg_mixup = cfg.mixup.clone()
        if cfg.mode == "off":
            self.cfg_mixup.defrost()
            self.cfg_mixup.general.active = False
            self.cfg_mixup.general.mixup_strategies = []
            self.cfg_mixup.freeze()

        self.prev_target_data = None
        self.verbose = False

    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return len(self.target_data)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        output: Dict[str, Any] = {"index": index}

        vanilla = self.target_data.__getitem__(
            index, do_augmentation=False, do_network_preparation=False)
        if self.mode == "train":
            for key in ("semantic_weights", "center_weights",
                        "offset_weights"):
                vanilla.pop(key, None)
            adaptation_item = {
                "rgb": copy.deepcopy(vanilla["rgb"]),
                "camera_model": copy.deepcopy(vanilla["camera_model"]),
            }
        tmp_center_img = copy.deepcopy(vanilla["rgb"][0])
        low_contrast = is_low_contrast(
            np.array(vanilla["rgb"][0]), fraction_threshold=0.2,
            lower_percentile=10, upper_percentile=90)
        prepare_for_network(vanilla, self.target_data.normalization_cfg)
        output["target"] = vanilla
        output["target_is_low_contrast"] = low_contrast
        output["target"]["rgb_original"] = tmp_center_img

        if self.mode != "train":
            output["target"].pop("rgb_original", None)
            return output["target"]

        # ---------------- source replay (exhaust-before-repeat)
        if self.source_num_samples > 0:
            with self.lock:
                indices = self._sample_source_indices()
            output["source"] = []
            for i in indices:
                item = self.source_data.__getitem__(
                    int(i), do_augmentation=False,
                    do_network_preparation=False)
                tmp = copy.deepcopy(item["rgb"][0])
                # Histogram-match first, then augment
                # (replay_buffer.py:157-161).
                for key, value in item["rgb"].items():
                    item["rgb"][key] = transfer_histogram_style(
                        value, adaptation_item["rgb"][0], "rgb")
                augment_data(item, self.source_data.augmentation_cfg)
                prepare_for_network(item,
                                    self.source_data.normalization_cfg)
                item["rgb_original"] = tmp
                output["source"].append(item)

        # ---------------- augmented online target
        augment_data(adaptation_item, self.target_data.augmentation_cfg)
        prepare_for_network(adaptation_item,
                            self.target_data.normalization_cfg)
        output["target_augmented"] = [adaptation_item]

        # ---------------- target replay. Index selection under the
        # lock: the adaptation loop's deferred buffer.add runs on the
        # main thread while the prefetch worker is in here, and an
        # eviction between the sum() check and the np.where snapshot
        # would sample from a torn view. Item loading stays outside
        # (dataset reads by index don't touch buffer state).
        with self.lock:
            extra = len(self.buffer_indices.get("prev_target", []))
            have_targets = (self.target_num_samples > 0
                            and int(self.buffer_indices["target"].sum())
                            + extra > 0)
            if have_targets:
                buffer_indices = np.where(
                    self.buffer_indices["target"])[0].tolist()
                if extra > 0:
                    buffer_indices += self.buffer_indices["prev_target"]
                indices = self.target_sampler.choice(
                    buffer_indices, self.target_num_samples,
                    replace=self.target_num_samples > len(buffer_indices))
        if have_targets:
            output["target_replay"] = []
            for i in indices:
                target_item = self._get_target_item(
                    int(i), do_augmentation=False,
                    do_network_preparation=False)
                tmp = copy.deepcopy(target_item["rgb"][0])
                augment_data(target_item,
                             self.target_data.augmentation_cfg)
                prepare_for_network(target_item,
                                    self.target_data.normalization_cfg)
                target_item["rgb_original"] = tmp
                output["target_replay"].append(target_item)
                # Second augmented copy joins target_augmented
                # (replay_buffer.py:203-210).
                aug_item = self._get_target_item(int(i),
                                                 do_augmentation=True,
                                                 do_network_preparation=True)
                output["target_augmented"].append(aug_item)

        # ---------------- mixup raw materials
        if self.source_num_samples == 0 and self.cfg_mixup.general.active:
            raise RuntimeError(
                "Mixup is active but source_num_samples equals 0")
        if self.cfg_mixup.general.active:
            assert (self.cfg_mixup.general.nof_samples
                    == len(self.cfg_mixup.general.mixup_strategies)), \
                "nof_samples must match the number of mixup strategies"
            strategies = list(self.cfg_mixup.general.mixup_strategies)
            indices_tgt: List[int] = []
            indices_src: List[int] = []
            for mix_counter in range(1,
                                     self.cfg_mixup.general.nof_samples + 1):
                if not indices_src:
                    indices_src = list(range(self.source_num_samples))
                if not indices_tgt:
                    indices_tgt = list(range(self.target_num_samples))

                strategy = self.mixup_sampler.choice(strategies)
                strategies.remove(strategy)

                idx_src = int(self.mixup_sampler.choice(indices_src))
                sample_src = output["source"][idx_src]
                indices_src.remove(idx_src)

                if mix_counter == 1 or "target_replay" not in output:
                    sample_tgt = output["target"]
                    tgt_is_replay = 0
                else:
                    idx_tgt = int(self.mixup_sampler.choice(indices_tgt))
                    sample_tgt = output["target_replay"][idx_tgt]
                    indices_tgt.remove(idx_tgt)
                    tgt_is_replay = 1

                mixup_item = self._get_data_for_mixup(sample_src, sample_tgt)
                mixup_item["tgt_is_replay"] = tgt_is_replay
                output.setdefault(str(strategy), []).append(mixup_item)

        for key in ("target", "target_replay", "source"):
            if key in output:
                items = output[key] if isinstance(output[key], list) \
                    else [output[key]]
                for item in items:
                    item.pop("rgb_original", None)
        return output

    # ------------------------------------------------------------------

    def _get_target_item(self, index: int, **kwargs):
        if index >= PREV_TARGET_OFFSET:
            return self.prev_target_data.__getitem__(
                index - PREV_TARGET_OFFSET, return_only_rgb=True, **kwargs)
        return self.target_data.__getitem__(index, return_only_rgb=True,
                                            **kwargs)

    def _sample_source_indices(self) -> np.ndarray:
        """Exhaust-before-repeat sampling (replay_buffer.py:123-148)."""
        source = self.buffer_indices["source"]
        remaining = int(source.sum())
        if self.source_num_samples < remaining:
            candidates = np.where(source)[0].tolist()
            indices = self.source_sampler.choice(
                candidates, self.source_num_samples, replace=False)
            for i in indices:
                source[i] = 0
        elif self.source_num_samples == remaining:
            indices = np.where(source)[0]
            for i in self.source_samples_indices:
                source[i] = 1
        else:
            indices_1 = np.where(source)[0]
            for i in self.source_samples_indices:
                source[i] = 1
            candidates = np.where(source)[0].tolist()
            indices_2 = self.source_sampler.choice(
                candidates, self.source_num_samples - len(indices_1),
                replace=False)
            for i in indices_2:
                source[i] = 0
            indices = np.concatenate([indices_1, indices_2])
        return indices

    def _get_data_for_mixup(self, sample_src, sample_tgt):
        """Mixup raw materials (replay_buffer.py:284-309)."""
        out: Dict[str, Any] = {}
        rgb_src = {"rgb": {0: transfer_histogram_style(
            sample_src["rgb_original"], sample_tgt["rgb_original"], "rgb")}}
        augment_data(rgb_src, self.source_data.augmentation_cfg)
        prepare_for_network(rgb_src, self.source_data.normalization_cfg)
        out["rgb_src"] = {0: rgb_src["rgb"][0]}
        out["rgb_tgt"] = {0: sample_tgt["rgb"][0]}
        out["semantic_src"] = np.asarray(sample_src["semantic"])
        out["instance_src"] = np.asarray(sample_src["instance"])
        out["camera_model_src"] = sample_src["camera_model"]
        out["camera_model_tgt"] = sample_tgt["camera_model"]
        return out

    # ------------------------------------------------------------------

    def initialize_source_buffer(self, source_data,
                                 number_samples: Optional[int]) -> None:
        """Fill the source buffer, optionally with rare-class sampling
        (replay_buffer.py:320-385)."""
        if self.mode != "train":
            return
        if number_samples is not None:
            assert number_samples >= self.source_num_samples
        assert source_data.stuff_classes == self.stuff_classes
        assert source_data.thing_classes == self.thing_classes
        self.source_data = source_data
        self.buffer_indices["source"] = np.zeros(len(source_data), np.int32)

        if number_samples is not None:
            if self.maximize_diversity:
                data = source_data.load_class_distribution()
                if data is None:
                    raise FileNotFoundError(
                        "Rare-class source sampling needs the precomputed "
                        "class distribution (reference: pickled next to the "
                        "dataset, datasets/replay_buffer.py:320-385). Run "
                        "scripts/compute_class_distribution.py for "
                        f"{source_data.path_base}.")
                number_pixels = data["num_pixels"]
                class_images = data["class_images"]
                images_numbers_pixels = data["images_num_pixels"]

                total = sum(number_pixels.values())
                frequency = {c: n / total for c, n in number_pixels.items()}
                temperature = 0.01
                probability = {c: np.exp((1 - f) / temperature)
                               for c, f in frequency.items()}
                norm = sum(probability.values())
                probability = {c: p / norm for c, p in probability.items()}

                sampler = np.random.default_rng(self.buffer_seed)
                self.source_samples_indices = []
                while len(self.source_samples_indices) < number_samples:
                    sampled_class = sampler.choice(
                        list(probability.keys()),
                        p=list(probability.values()))
                    possible = class_images[sampled_class]
                    pix = {img: images_numbers_pixels[img][sampled_class]
                           for img in possible}
                    weights = np.asarray(list(pix.values()), np.float64)
                    sampled_image = sampler.choice(
                        possible, p=weights / weights.sum())
                    if sampled_image not in self.source_samples_indices:
                        self.source_samples_indices.append(sampled_image)
            else:
                rng = np.random.default_rng(self.buffer_seed)
                self.source_samples_indices = rng.choice(
                    len(source_data), number_samples,
                    replace=False).tolist()
            self.source_samples_indices.sort()
        else:
            self.source_samples_indices = list(range(len(source_data)))
        for i in self.source_samples_indices:
            self.buffer_indices["source"][i] = 1

    # ------------------------------------------------------------------

    def add(self, index: int,
            image_features: Optional[np.ndarray] = None) -> None:
        """Add a seen frame; maintain the diversity-maximizing buffer
        (replay_buffer.py:387-460).

        Serialized against the prefetch worker's source/target-replay
        index sampling (__getitem__) by self.lock: the adaptation loop
        calls add() on its main thread while a prefetch may be in
        flight, and an unlocked eviction would tear the worker's view
        of buffer_indices.

        Args:
          image_features: last-stage encoder features of the frame,
            (H', W', C) or (1, H', W', C); mean-pooled + L2-normalized here.
        """
        with self.lock:
            self._add_locked(index, image_features)

    def _add_locked(self, index: int,
                    image_features: Optional[np.ndarray] = None) -> None:
        if not self.maximize_diversity:
            self.buffer_indices["target"][index] = 1
            if self.buffer_indices["target"].sum() > self.target_buffer_size:
                candidates = np.where(
                    self.buffer_indices["target"])[0].tolist()
                remove_index = self.buffer_remove_sampler.choice(candidates)
                self.buffer_indices["target"][remove_index] = 0
            return

        assert image_features is not None
        feats = np.asarray(image_features, np.float32)
        if feats.ndim == 4:
            feats = feats[0]
        if feats.ndim == 3:
            feats = feats.mean(axis=(0, 1))
        elif feats.ndim == 2:
            feats = feats[0]  # already pooled in-jit: (1, C)
        flattened = feats[None]  # (1, C)
        norm = np.linalg.norm(flattened, axis=1, keepdims=True)
        flattened = flattened / np.maximum(norm, 1e-12)

        if self.sim_index is None:
            self.sim_index = SimIndex(flattened.shape[1])

        extra = len(self.buffer_indices.get("prev_target", []))

        if self.sim_index.ntotal == 0:
            similarity = 0.0
        else:
            scores, _ = self.sim_index.search(flattened, 1)
            similarity = float(scores[0, 0])
        if similarity >= self.similarity_threshold:
            return

        self.sim_index.add_with_ids(flattened, np.asarray([index]))
        self.buffer_indices["target"][index] = 1
        if self.verbose:
            print(f"Added sample {index} to the target buffer | "
                  f"similarity {similarity}")

        if int(self.buffer_indices["target"].sum()) + extra \
                <= self.target_buffer_size:
            return

        # ---- evict argmax of summed pairwise similarity
        if self.distance_matrix is None:
            ids, vectors = self.sim_index.dump()
            self.distance_matrix = vectors @ vectors.T
            self.distance_matrix_indices = ids.astype(np.int64)
        else:
            fill = np.argwhere(self.distance_matrix_indices < 0)[0, 0]
            self.distance_matrix_indices[fill] = index
            ids, vectors = self.sim_index.dump()
            sims = (vectors @ flattened[0]).astype(np.float32)
            # order sims by distance_matrix_indices
            sorter = np.argsort(ids)
            sorter_idx = sorter[np.searchsorted(
                ids, self.distance_matrix_indices, sorter=sorter)]
            row = sims[sorter_idx]
            self.distance_matrix[fill, :] = row
            self.distance_matrix[:, fill] = row

        remove_tmp = int(np.argmax(self.distance_matrix.sum(0)
                                   - self.distance_matrix.diagonal()))
        self.distance_matrix[:, remove_tmp] = -1
        self.distance_matrix[remove_tmp, :] = -1
        remove_index = int(self.distance_matrix_indices[remove_tmp])
        self.distance_matrix_indices[remove_tmp] = -1
        self.sim_index.remove_ids(np.asarray([remove_index]))

        if remove_index >= PREV_TARGET_OFFSET:
            self.buffer_indices["prev_target"].remove(remove_index)
        else:
            self.buffer_indices["target"][remove_index] = 0
        if self.verbose:
            print(f"Removed sample {remove_index} from the target buffer")

    # ------------------------------------------------------------------

    def save_state(self, path: str = "buffer_state.pkl") -> None:
        """Persist buffer features for continual chains
        (replay_buffer.py:462-473). The whole target dataset object is
        pickled alongside (reference parity, replay_buffer.py:472): a
        continual chain may cross dataset TYPES (KITTI-360 ->
        SemKITTI-DVPS), so the next domain cannot reconstruct the
        previous one from its own config."""
        ids, vectors = self.sim_index.dump()
        with open(path, "wb") as handle:
            pickle.dump({
                "target_samples_indices": ids.tolist(),
                "features": [vectors[i] for i in range(len(ids))],
                "target_frame_paths": self.target_data.frame_paths,
                "target_dataset": self.target_data,
            }, handle)

    def load_state(self, prev_target_data=None,
                   path: str = "buffer_state.pkl") -> None:
        """Restore a previous domain's buffer as prev_target entries
        (replay_buffer.py:475-500).

        With ``prev_target_data=None`` the dataset pickled by save_state
        is restored (the reference's behavior); passing an explicit
        dataset re-points it at the saved frame paths (useful when the
        data root moved between runs)."""
        with open(path, "rb") as handle:
            state = pickle.load(handle)
        if prev_target_data is None:
            prev_target_data = state.get("target_dataset")
            if prev_target_data is None:
                raise ValueError(
                    f"{path} predates dataset-carrying buffer states; "
                    "pass prev_target_data explicitly")
            self.prev_target_data = prev_target_data
        else:
            self.prev_target_data = prev_target_data
            self.prev_target_data.frame_paths = state["target_frame_paths"]
        indices = state["target_samples_indices"]
        features = state["features"]

        self.buffer_indices["prev_target"] = [
            PREV_TARGET_OFFSET + idx for idx in indices]
        self.sim_index = SimIndex(features[0].size)
        for idx, feature in zip(indices, features):
            self.sim_index.add_with_ids(
                np.asarray(feature, np.float32).reshape(1, -1),
                np.asarray([PREV_TARGET_OFFSET + idx]))

        if self.sim_index.ntotal == self.target_buffer_size:
            ids, vectors = self.sim_index.dump()
            n = len(ids) + 1
            self.distance_matrix_indices = np.append(
                ids.astype(np.int64), [-1])
            self.distance_matrix = -np.ones((n, n), np.float32)
            self.distance_matrix[:n - 1, :n - 1] = vectors @ vectors.T

    # ------------------------------------------------------------------

    @property
    def stuff_classes(self):
        return self.target_data.stuff_classes

    @property
    def thing_classes(self):
        return self.target_data.thing_classes

    @property
    def ignore_classes(self):
        return self.target_data.ignore_classes

    @property
    def num_classes(self):
        return self.target_data.num_classes

    @property
    def num_things(self):
        return self.target_data.num_things

    @property
    def num_stuff(self):
        return self.target_data.num_stuff
