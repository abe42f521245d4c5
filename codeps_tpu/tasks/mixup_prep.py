"""Fused device-side mixup preparation.

One jitted program per frame replaces the reference's scattered per-item
device work (adapt_codeps.py:174-199 + mixup.py:405-444): for the whole
stack of Nm mixup items it computes the teacher's semantic/center/offset
predictions, panoptic-fuses them into pseudo instance labels, and applies
the geometric camera-to-camera warp into the source frame — one dispatch,
one fetch. The host then does only cheap numpy mask composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from codeps_tpu.models.codeps_net import CodepsModules
from codeps_tpu.ops.panoptic import get_panoptic_segmentation
from codeps_tpu.tasks.forward import apply_encoder


def c2c_grid(intr_src: jnp.ndarray, intr_tgt: jnp.ndarray,
             src_size: tuple[int, int],
             out_size: tuple[int, int]) -> jnp.ndarray:
    """Normalized sampling grid for the unit-depth camera-to-camera warp.

    Parity: Mixup.warp_c2c / _src_pcl_to_tgt (mixup.py:28-66, 210-229).

    Args:
      intr_src: (B, 4) intrinsics of the *sampled* image.
      intr_tgt: (B, 4) intrinsics of the output frame.
    Returns:
      (B, out_h, out_w, 2) grid for grid_sample over a src_size image.
    """
    out_h, out_w = out_size
    src_h, src_w = src_size
    fx_t = intr_tgt[:, 0][:, None, None]
    fy_t = intr_tgt[:, 1][:, None, None]
    cx_t = intr_tgt[:, 2][:, None, None]
    cy_t = intr_tgt[:, 3][:, None, None]
    fx_s = intr_src[:, 0][:, None, None]
    fy_s = intr_src[:, 1][:, None, None]
    cx_s = intr_src[:, 2][:, None, None]
    cy_s = intr_src[:, 3][:, None, None]

    u = jnp.arange(out_w, dtype=jnp.float32)[None, None, :]
    v = jnp.arange(out_h, dtype=jnp.float32)[None, :, None]
    x3d = (u - cx_t) / fx_t
    y3d = (v - cy_t) / fy_t
    u2d = x3d * fx_s + cx_s
    v2d = y3d * fy_s + cy_s
    grid_u = (u2d / (src_w - 1) - 0.5) * 2.0
    grid_v = (v2d / (src_h - 1) - 0.5) * 2.0
    grid_u = jnp.broadcast_to(grid_u, (intr_src.shape[0], out_h, out_w))
    grid_v = jnp.broadcast_to(grid_v, (intr_src.shape[0], out_h, out_w))
    return jnp.stack([grid_u, grid_v], axis=-1)


def c2c_prewarp(intr_sampled, intr_out, sampled_size: tuple[int, int],
                out_size: tuple[int, int]):
    """Host float64 camera-to-camera warp precomputation.

    Mirrors the reference's unit-depth reprojection (mixup.py:28-66 via
    camera_model.py:43-50) computed in float64 — the reference runs its
    whole warp in double (mixup.py:224-226) — and returns the
    ``prewarp_host`` tap/weight pytree for ``grid_sample_pair_pre``.
    Integer tap anchors are decided on the host so XLA fusion cannot
    desynchronize the index and weight chains at exactly-integer warp
    coordinates (see ops/grid_sample.prewarp_host).

    Args:
      intr_sampled: (B, 4) fx/fy/cx/cy of the SAMPLED image.
      intr_out: (B, 4) intrinsics of the output pixel lattice.
    """
    import numpy as np
    intr_sampled = np.asarray(intr_sampled, np.float64)
    intr_out = np.asarray(intr_out, np.float64)
    out_h, out_w = out_size
    src_h, src_w = sampled_size
    u = np.arange(out_w, dtype=np.float64)[None, None, :]
    v = np.arange(out_h, dtype=np.float64)[None, :, None]
    fx_o, fy_o = intr_out[:, 0, None, None], intr_out[:, 1, None, None]
    cx_o, cy_o = intr_out[:, 2, None, None], intr_out[:, 3, None, None]
    fx_s, fy_s = (intr_sampled[:, 0, None, None],
                  intr_sampled[:, 1, None, None])
    cx_s, cy_s = (intr_sampled[:, 2, None, None],
                  intr_sampled[:, 3, None, None])
    x = np.broadcast_to((u - cx_o) / fx_o * fx_s + cx_s,
                        (intr_out.shape[0], out_h, out_w))
    y = np.broadcast_to((v - cy_o) / fy_o * fy_s + cy_s,
                        (intr_out.shape[0], out_h, out_w))
    from codeps_tpu.ops.grid_sample import prewarp_host
    return prewarp_host(x, y, src_h, src_w)


def make_plabel_prep_step(modules: CodepsModules, thing_list,
                          src_size: tuple[int, int],
                          geom_augment: bool = True,
                          mean=None, std=None):
    """Build the fused pseudo-label + fusion + warp program.

    fn(params, batch_stats, rgb_tgt (Nm, Ht, Wt, 3), warp) ->
      (rgb_warped (Nm, Hs, Ws, 3), semantic_warped (Nm, Hs, Ws) int32,
       instance_warped (Nm, Hs, Ws) int32) — in the source frame when
      geom_augment (``warp`` is the host-computed ``c2c_prewarp`` pytree
      mapping source pixels to target coordinates), else at target
      resolution (no ``warp`` argument). The returned rgb is in
      NORMALIZED float space; ``mean``/``std`` thread the cfg's
      normalization constants for raw uint8 inputs.
    """
    thing_list = tuple(thing_list)
    num_classes = modules.num_classes
    norm_kwargs = {}
    if mean is not None:
        norm_kwargs["mean"] = tuple(mean)
    if std is not None:
        norm_kwargs["std"] = tuple(std)

    def prep(params, batch_stats, rgb_tgt, warp=None):
        from codeps_tpu.ops.normalize import maybe_normalize
        rgb_tgt = maybe_normalize(rgb_tgt, **norm_kwargs)
        feats, _ = apply_encoder(
            modules.backbone_po_depth, params["backbone_po_depth"],
            batch_stats["backbone_po_depth"], rgb_tgt, train=False)
        sem_probs = modules.semantic_head.apply(
            {"params": params["semantic_head"]}, feats)
        sem_pred = jnp.argmax(sem_probs, axis=-1).astype(jnp.int32)
        center, offset, _ = modules.instance_head.apply(
            {"params": params["instance_head"],
             "batch_stats": batch_stats["instance_head"]},
            feats, train=False)

        def fuse(sem, ctr, off):
            _, inst, _ = get_panoptic_segmentation(
                sem, ctr[..., 0], off, thing_list,
                num_classes=num_classes, do_merge=False)
            return inst

        instance = jax.vmap(fuse)(sem_pred, center, offset)

        if not geom_augment:
            return rgb_tgt, sem_pred, instance

        # ONE packed gather for everything sharing the warp: the
        # bilinear/zeros RGB and the nearest/border label pair (TPU
        # gathers serialize per ROW, ~width-independent — see
        # grid_sample_pair). Tap anchors/weights arrive precomputed from
        # the host in float64 (c2c_prewarp) so fusion cannot flip taps
        # at exactly-integer warp coordinates. instance needs
        # nearest+ZEROS semantics; recover it by masking the
        # border-sampled channel with the host-computed insideness of
        # the UNCLIPPED rounded index.
        from codeps_tpu.ops.grid_sample import grid_sample_pair_pre
        pair = jnp.stack([instance.astype(jnp.float32),
                          sem_pred.astype(jnp.float32)], axis=-1)
        rgb_w, pair_w = grid_sample_pair_pre(rgb_tgt, pair, warp)
        inst_w = (pair_w[..., 0] * warp["nn_inside"]).astype(jnp.int32)
        sem_w = pair_w[..., 1].astype(jnp.int32)
        return rgb_w, sem_w, inst_w

    return jax.jit(prep)
