"""Run a trained CoDEPS-TPU checkpoint on a directory of images.

Convenience inference CLI on top of the ``CodepsNet`` facade
(models/facade.py — the reference's forward(mode=infer/eval) surface,
/root/reference/codeps/online_adap.py:53-270, which upstream exposes
only programmatically). Writes per-image visualization panels (RGB,
depth, semantic, panoptic) and optional raw ``.npz`` predictions.

Example:
    python scripts/infer.py --checkpoint ckpt_dir_or.pth \
        --filename_config cfg/adapt_cityscapes_kitti_360.yaml \
        --images /path/to/frames --output preds/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True,
                        help="Orbax checkpoint dir or reference .pth")
    parser.add_argument("--filename_config", required=True,
                        help="YAML config (model geometry + label mode)")
    parser.add_argument("--images", required=True,
                        help="Image file, directory, or glob")
    parser.add_argument("--output", required=True)
    parser.add_argument("--save_raw", action="store_true",
                        help="Also write raw predictions as .npz")
    parser.add_argument("--batch_size", type=int, default=1)
    return parser.parse_args()


def list_images(spec: str) -> list[Path]:
    import glob as globlib
    p = Path(spec)
    if p.is_dir():
        files = sorted(q for q in p.iterdir()
                       if q.suffix.lower() in (".png", ".jpg", ".jpeg"))
    elif p.exists():
        files = [p]
    else:
        # glob.glob supports wildcards in ANY path component
        # (Path.parent.glob would take a wildcarded directory literally)
        files = sorted(Path(m) for m in globlib.glob(spec, recursive=True))
    if not files:
        raise FileNotFoundError(f"No images match {spec!r}")
    return files


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from codeps_tpu.config import gen_config
    from codeps_tpu.data import get_labels
    from codeps_tpu.io import (pretrained_from_checkpoints,
                               log_info, init_logging)
    from codeps_tpu.io.visualizations import (colorize_depth,
                                              colorize_panoptic,
                                              colorize_semantic)
    from codeps_tpu.models import CodepsNet, build_modules, init_params

    init_logging()
    # Adaptation YAMLs carry a top-level `adapt` node — merge them over
    # the adapt defaults tree (gen_config would otherwise silently treat
    # the node as a new key on the train tree).
    import yaml
    with open(args.filename_config) as f:
        is_adapt = "adapt" in (yaml.safe_load(f) or {})
    cfg = gen_config(args.filename_config, adapt=is_adapt)
    labels = get_labels(cfg.dataset.remove_classes, cfg.dataset.label_mode)
    num_classes = len(labels)
    thing_list = [i for i, lb in enumerate(labels) if lb.hasInstances]

    feed_h, feed_w = cfg.dataset.feed_img_size
    modules = build_modules(cfg, num_classes)
    params, batch_stats = init_params(
        jax.random.PRNGKey(0), modules, (feed_h, feed_w))
    params, batch_stats = pretrained_from_checkpoints(
        [args.checkpoint], params, batch_stats, cfg)
    # Thread the checkpoint's normalization (a model trained with
    # non-ImageNet stats or active:false would otherwise get
    # mis-normalized input and silently wrong predictions).
    norm = cfg.dataset.normalization
    net = CodepsNet(modules, params, batch_stats, thing_list=thing_list,
                    rgb_mean=tuple(norm.rgb_mean),
                    rgb_std=tuple(norm.rgb_std),
                    normalize=bool(norm.active))

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)
    files = list_images(args.images)
    log_info("Running inference on %d images -> %s", len(files), out_dir)

    for start in range(0, len(files), args.batch_size):
        chunk = files[start:start + args.batch_size]
        frames = []
        for f in chunk:
            img = Image.open(f).convert("RGB").resize(
                (feed_w, feed_h), Image.LANCZOS)
            frames.append(np.asarray(img, np.uint8))
        # Pad a ragged final chunk to the batch size: a second batch
        # shape would trigger a full extra XLA compile (minutes on a
        # cold cache); the per-image loop below only reads len(chunk)
        # rows, so padded outputs are simply dropped.
        while len(frames) < args.batch_size:
            frames.append(frames[-1])
        batch = jnp.asarray(np.stack(frames))  # uint8: normalized in-jit
        result = net(batch, mode="eval")

        for i, f in enumerate(chunk):
            stem = f.stem
            Image.fromarray(frames[i]).save(out_dir / f"{stem}_rgb.png")
            raw = {}
            if "depth" in result:
                # facade returns full-res metric depth (B, H, W, 1)
                depth = np.asarray(result["depth"][i])[..., 0]
                Image.fromarray(colorize_depth(depth)).save(
                    out_dir / f"{stem}_depth.png")
                raw["depth"] = depth
            if "semantic" in result:
                sem = np.asarray(result["semantic"][i])
                Image.fromarray(colorize_semantic(
                    sem, cfg.dataset.remove_classes,
                    cfg.dataset.label_mode)).save(
                    out_dir / f"{stem}_semantic.png")
                raw["semantic"] = sem
            if "panoptic" in result:
                pan = np.asarray(result["panoptic"][i])
                Image.fromarray(colorize_panoptic(
                    pan, cfg.dataset.remove_classes,
                    cfg.dataset.label_mode)).save(
                    out_dir / f"{stem}_panoptic.png")
                raw["panoptic"] = pan
            if args.save_raw:
                np.savez_compressed(out_dir / f"{stem}.npz", **raw)
    log_info("Done: %d images", len(files))


if __name__ == "__main__":
    main()
