"""Pure forward functions over CodepsModules + param/stat pytrees.

Replaces the reference's CodepsNet.forward orchestration
(/root/reference/codeps/online_adap.py:53-270) with jit-composable
functions. Camera intrinsics stay traced (B, 4) arrays throughout.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from codeps_tpu.models.codeps_net import CodepsModules


def apply_encoder(module, params, stats, x: jnp.ndarray, train: bool):
    """Run an encoder; returns (features, new_batch_stats)."""
    variables = {"params": params, "batch_stats": stats}
    if train:
        feats, updates = module.apply(variables, x, train=True,
                                      mutable=["batch_stats"])
        return feats, updates["batch_stats"]
    feats = module.apply(variables, x, train=False)
    return feats, stats


def depth_forward(modules: CodepsModules, params, batch_stats,
                  images: Sequence[jnp.ndarray],
                  feats_center: Sequence[jnp.ndarray],
                  train: bool,
                  feats_neighbors: Sequence[Sequence[jnp.ndarray]] | None = None):
    """Depth/pose/flow forward over a triplet.

    Parity: DepthAlgo._forward (/root/reference/algos/depth.py:373-423):
      - depth for the center frame (all three frames when the flow head is
        active, since RGB-D pose input needs per-frame depth),
      - pose backbone on channel-stacked [t-1, t] (pose inverted) and
        [t, t+1],
      - flow maps negated for the backward pair.

    The two pose-backbone passes are batched into one 2B forward: the pair
    axis folds into the batch axis so the ResNet runs once at 2x batch
    (MXU-friendlier than two B-sized passes; identical math, and BN train
    statistics see both pairs at once).

    Args:
      images: [img_t, img_tm1, img_tp1], each (B, H, W, 3).
      feats_center: encoder pyramid of frame t.
      feats_neighbors: encoder pyramids of [t-1, t+1] (flow mode only).

    Returns:
      dict with depth, disparity, transformations [T(t->t-1), T(t->t+1)],
      object_motion_maps (or None), new pose-backbone batch stats.
    """
    use_flow = modules.flow_head is not None

    depth_t, disp_t = modules.depth_head.apply(
        {"params": params["depth_head"]}, feats_center)

    if use_flow:
        assert feats_neighbors is not None
        depth_tm1, _ = modules.depth_head.apply(
            {"params": params["depth_head"]}, feats_neighbors[0])
        depth_tp1, _ = modules.depth_head.apply(
            {"params": params["depth_head"]}, feats_neighbors[1])
        depths = [depth_t, depth_tm1, depth_tp1]
        # RGB-D input, depth detached (algos/depth.py:395-401).
        motion_inputs = [
            jnp.concatenate([img, jax.lax.stop_gradient(d)], axis=-1)
            for img, d in zip(images, depths)
        ]
    else:
        motion_inputs = list(images)

    # Stack the two pairs onto the batch axis: [cat(t-1, t); cat(t, t+1)].
    pair_bwd = jnp.concatenate([motion_inputs[1], motion_inputs[0]], axis=-1)
    pair_fwd = jnp.concatenate([motion_inputs[0], motion_inputs[2]], axis=-1)
    pairs = jnp.concatenate([pair_bwd, pair_fwd], axis=0)

    pose_feats, new_pose_stats = apply_encoder(
        modules.backbone_pose_sflow, params["backbone_pose_sflow"],
        batch_stats["backbone_pose_sflow"], pairs, train)

    batch = images[0].shape[0]
    feats_bwd = [f[:batch] for f in pose_feats]
    feats_fwd = [f[batch:] for f in pose_feats]

    t_bwd = modules.pose_head.apply({"params": params["pose_head"]},
                                    feats_bwd, invert_pose=True)
    t_fwd = modules.pose_head.apply({"params": params["pose_head"]},
                                    feats_fwd, invert_pose=False)

    object_motion_maps = None
    if use_flow:
        flow_bwd = modules.flow_head.apply({"params": params["flow_head"]},
                                           feats_bwd)
        flow_fwd = modules.flow_head.apply({"params": params["flow_head"]},
                                           feats_fwd)
        object_motion_maps = [-flow_bwd, flow_fwd]

    return {
        "depth": depth_t,
        "disparity": disp_t,
        "transformations": [t_bwd, t_fwd],
        "object_motion_maps": object_motion_maps,
        "pose_batch_stats": new_pose_stats,
    }


def encode_frames(modules: CodepsModules, params, batch_stats,
                  frames: jnp.ndarray, train: bool):
    """Encode a stack of frames (B, N, H, W, 3) in one backbone pass.

    Folding the frame axis into batch runs the ResNet once at N*B — one
    MXU-saturating pass instead of the reference's N sequential forwards
    (codeps/online_adap.py:83-85).
    """
    b, n, h, w, c = frames.shape
    flat = frames.reshape(b * n, h, w, c)
    feats, new_stats = apply_encoder(
        modules.backbone_po_depth, params["backbone_po_depth"],
        batch_stats["backbone_po_depth"], flat, train)
    per_frame = [[f.reshape(b, n, *f.shape[1:])[:, i] for f in feats]
                 for i in range(n)]
    return per_frame, new_stats
