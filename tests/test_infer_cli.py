"""End-to-end test for scripts/infer.py (checkpoint + image dir ->
visualization panels and raw predictions).

The CLI wraps the CodepsNet facade's eval forward (the reference
exposes mode=eval only programmatically, online_adap.py:53-270); this
drives the real subprocess on a tiny checkpoint to lock the CLI
surface: config detection, checkpoint loading, panel + .npz outputs.
"""
import os
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from codeps_tpu.config import gen_config  # noqa: E402
from codeps_tpu.data import get_labels  # noqa: E402
from codeps_tpu.io import save_checkpoint  # noqa: E402
from codeps_tpu.models import build_modules, init_params  # noqa: E402

TINY_YAML = """\
model:
  po_depth_net:
    params:
      nof_layers: 18
  pose_sflow_net:
    params:
      nof_layers: 18
dataset:
  feed_img_size: [32, 64]
  center_heatmap_sigma: 4
"""


def test_infer_cli_end_to_end(tmp_path):
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)

    # Checkpoint with the exact module geometry the CLI will rebuild.
    cfg = gen_config(str(cfg_path))
    labels = get_labels(cfg.dataset.remove_classes, cfg.dataset.label_mode)
    modules = build_modules(cfg, len(labels))
    params, stats = init_params(jax.random.PRNGKey(3), modules, (32, 64))
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), cfg, epoch=0, global_step=0,
                    params=params, batch_stats=stats)

    img_dir = tmp_path / "frames"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    for name in ("000000", "000001"):
        arr = rng.integers(0, 255, (48, 80, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"{name}.png")

    out_dir = tmp_path / "preds"
    env = os.environ.copy()
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
                "XLA_FLAGS": ""})
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "infer.py"),
         "--checkpoint", str(ckpt),
         "--filename_config", str(cfg_path),
         "--images", str(img_dir),
         "--output", str(out_dir), "--save_raw"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]

    for stem in ("000000", "000001"):
        for panel in ("rgb", "depth", "semantic", "panoptic"):
            f = out_dir / f"{stem}_{panel}.png"
            assert f.exists(), f"missing {f.name}; stderr: {proc.stderr[-500:]}"
            assert Image.open(f).size == (64, 32)
        raw = np.load(out_dir / f"{stem}.npz")
        assert raw["depth"].shape == (32, 64)
        assert np.all(raw["depth"] > 0)
        assert raw["semantic"].shape == (32, 64)
        assert raw["semantic"].max() < len(labels)
        # panoptic ids encode class * divisor + instance
        assert raw["panoptic"].shape == (32, 64)
