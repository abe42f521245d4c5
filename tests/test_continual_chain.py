"""Stream-level continual chain: CS -> KITTI-360 -> SemKITTI-DVPS via two
`scripts/adapt.py` invocations bridged by --save_buffer_state /
--buffer_state (the clean version of the reference's hardcoded +10000
continual path, /root/reference/datasets/replay_buffer.py:189-209,462-500).

Asserts what the unit-level buffer tests cannot: that the SECOND domain's
live adaptation stream actually samples the FIRST domain's frames as
prev_target replay (through a different dataset TYPE — Kitti360 frames
served inside a SemKittiDvps-driven stream)."""

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

PHASE1_YAML = """
model:
  make_depth: true
  make_sflow: false
  make_semantic: true
  make_instance: true
  po_depth_net:
    params:
      nof_layers: 18
  pose_sflow_net:
    params:
      nof_layers: 18

adapt:
  model:
    backbone_po_depth: false
    instance: false
  ema:
    semantic: true
    alpha: 0.99
  source_dataset:
    name: cityscapes
    path: {cs_root}
    feed_img_size: [32, 64]
  replay_sampler:
    nof_source_samples: 2
    nof_target_samples: 2
  replay_buffer:
    maximize_diversity: true
    target_size: 3
  mixup:
    general:
      active: false
      mixup_strategies: []
      nof_samples: 0

train:
  nof_adaptation_steps: 1

dataset:
  name: {target_name}
  path: {target_root}
  sequences: ["{sequence}"]
  feed_img_size: [32, 64]
  center_heatmap_sigma: 4

depth:
  num_recon_scales: 2

semantics:
  class_weights: [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                  1.0, 1.0, 1.0]
"""


def _write_cfg(path, cs_root, target_name, target_root, sequence):
    text = PHASE1_YAML.format(cs_root=cs_root, target_name=target_name,
                              target_root=target_root, sequence=sequence)
    path.write_text(text)
    return str(path)


def _run_adapt_main(monkeypatch, argv):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "adapt_cli", REPO / "scripts" / "adapt.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(sys, "argv", ["adapt.py"] + argv)
    mod.main()


def test_continual_chain_two_cli_invocations(tmp_path, monkeypatch):
    from codeps_tpu.data.replay_buffer import (PREV_TARGET_OFFSET,
                                               ReplayBuffer)
    from codeps_tpu.data.synthetic import (make_cityscapes_tree,
                                           make_kitti360_tree,
                                           make_semkitti_tree)

    cs_root = make_cityscapes_tree(tmp_path / "cs", num_frames=6,
                                   width=96, height=64)
    k360_root = make_kitti360_tree(tmp_path / "k360", num_frames=8,
                                   width=96, height=64)
    sk_root = make_semkitti_tree(tmp_path / "semkitti", num_frames=8,
                                 width=96, height=64)

    state_path = tmp_path / "k360_buffer.pkl"
    exp_dir = tmp_path / "experiments"

    # ---------------- phase 1: CS -> KITTI-360, save the buffer state
    cfg1 = _write_cfg(tmp_path / "adapt_k360.yaml", cs_root,
                      "kitti_360", k360_root, "03")
    _run_adapt_main(monkeypatch, [
        "--run_name", "chain1", "--filename_config", cfg1,
        "--max_frames", "3", "--save_buffer_state", str(state_path),
        "--experiments_dir", str(exp_dir)])
    assert state_path.exists()
    import pickle
    saved = pickle.loads(state_path.read_bytes())
    assert len(saved["target_samples_indices"]) >= 1
    assert type(saved["target_dataset"]).__name__ == "Kitti360"

    # ---------------- phase 2: CS -> SemKITTI with the K360 buffer as
    # prev_target; spy on the replay item fetch to prove K360 frames mix
    # into the live SemKITTI stream.
    prev_hits = []
    orig_get = ReplayBuffer._get_target_item

    def spy(self, index, **kwargs):
        if index >= PREV_TARGET_OFFSET:
            prev_hits.append(index - PREV_TARGET_OFFSET)
        return orig_get(self, index, **kwargs)

    monkeypatch.setattr(ReplayBuffer, "_get_target_item", spy)

    cfg2 = _write_cfg(tmp_path / "adapt_semkitti.yaml", cs_root,
                      "sem_kitti_dvps", sk_root, "07")
    _run_adapt_main(monkeypatch, [
        "--run_name", "chain2", "--filename_config", cfg2,
        "--max_frames", "2", "--buffer_state", str(state_path),
        "--experiments_dir", str(exp_dir)])

    # prev_target replay was actually sampled into the second stream
    assert len(prev_hits) >= 1
    saved_ids = set(saved["target_samples_indices"])
    assert set(prev_hits) <= saved_ids
