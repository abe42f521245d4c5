"""User-facing model facade with the reference's mode-dispatch API.

Parity: CodepsNet.forward(mode=train/eval/infer)
(/root/reference/codeps/online_adap.py:53-270) as a convenience wrapper
over the pure jitted programs — for users who want a single object with
the familiar surface instead of composing tasks/* directly. (Training
loops should use tasks/train.py and tasks/adapt_loop.py, which manage
optimizer/EMA state.)
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from codeps_tpu.models.codeps_net import CodepsModules
from codeps_tpu.ops.panoptic import panoptic_fusion_batch
from codeps_tpu.tasks.forward import apply_encoder


class CodepsNet:
    """Inference/eval facade holding module defs + params."""

    def __init__(self, modules: CodepsModules, params: Dict[str, Any],
                 batch_stats: Dict[str, Any],
                 thing_list: Sequence[int] = (9, 10, 11, 12, 13),
                 rgb_mean: Sequence[float] | None = None,
                 rgb_std: Sequence[float] | None = None,
                 normalize: bool = True):
        """``rgb_mean``/``rgb_std``/``normalize`` thread the checkpoint's
        cfg.dataset.normalization for raw uint8 inputs (default:
        ImageNet constants; ``normalize=False`` = the cfg's
        ``active: false``, i.e. just /255). Pre-normalized float inputs
        pass through untouched either way."""
        self.modules = modules
        self.params = params
        self.batch_stats = batch_stats
        self.thing_list = tuple(thing_list)
        self.rgb_mean = None if rgb_mean is None else tuple(rgb_mean)
        self.rgb_std = None if rgb_std is None else tuple(rgb_std)
        self.normalize = normalize
        self._infer = jax.jit(self._forward, static_argnames=(
            "do_panoptic_fusion",))

    def _forward(self, params, batch_stats, image,
                 do_panoptic_fusion: bool = False):
        from codeps_tpu.ops.normalize import maybe_normalize
        if image.dtype == jnp.uint8 and not self.normalize:
            image = image.astype(jnp.float32) / 255.0
        else:
            norm_kwargs = {}
            if self.rgb_mean is not None:
                norm_kwargs["mean"] = self.rgb_mean
            if self.rgb_std is not None:
                norm_kwargs["std"] = self.rgb_std
            image = maybe_normalize(image, **norm_kwargs)
        feats, _ = apply_encoder(
            self.modules.backbone_po_depth, params["backbone_po_depth"],
            batch_stats["backbone_po_depth"], image, train=False)
        result: Dict[str, Any] = {}
        if self.modules.depth_head is not None:
            depth, _ = self.modules.depth_head.apply(
                {"params": params["depth_head"]}, feats)
            result["depth"] = depth
        if self.modules.semantic_head is not None:
            sem = self.modules.semantic_head.apply(
                {"params": params["semantic_head"]}, feats)
            result["semantic_soft"] = sem
            result["semantic"] = jnp.argmax(sem, axis=-1).astype(jnp.int32)
        if self.modules.instance_head is not None:
            center, offset, thing_mask = self.modules.instance_head.apply(
                {"params": params["instance_head"],
                 "batch_stats": batch_stats["instance_head"]},
                feats, train=False)
            result["center"] = center
            result["offset"] = offset
            result["thing_mask"] = thing_mask
        if (do_panoptic_fusion
                and self.modules.semantic_head is not None
                and self.modules.instance_head is not None):
            pan, inst, _ = panoptic_fusion_batch(
                result["semantic_soft"], result["center"],
                result["offset"], self.thing_list)
            result["panoptic"] = pan
            result["instance"] = inst
        return result

    def __call__(self, image: jnp.ndarray, mode: str = "infer",
                 do_panoptic_fusion: bool = False) -> Dict[str, Any]:
        """Run inference on a (B, H, W, 3) normalized image batch.

        mode 'infer' returns predictions; 'eval' additionally runs
        panoptic fusion (matching the reference's eval-mode usage).
        """
        assert mode in ("infer", "eval"), \
            "The facade covers infer/eval; use tasks/ for train/adapt"
        fuse = do_panoptic_fusion or mode == "eval"
        return self._infer(self.params, self.batch_stats, image,
                           do_panoptic_fusion=fuse)
