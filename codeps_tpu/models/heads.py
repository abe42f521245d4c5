"""Task heads (Flax): depth, pose, scene-flow, semantic, instance.

Capability parity with /root/reference/models/{depth_head,pose_head,
flow_head,semantic_head,instance_head}.py. NHWC layout; compute dtype is
configurable (bfloat16 on TPU), params/stats stay float32. Full-resolution
(eval/teacher) outputs are cast to float32 so losses accumulate at full
precision; the ONE exception is SemanticHead's training-only
``phase_space=True`` view, which stays in the compute dtype (the CE
re-casts per the loss dtype policy; see its docstring).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from codeps_tpu.geometry.pose import transformation_from_parameters
from codeps_tpu.ops.resize import (resize_bilinear, upsample_bilinear_2x_align,
                                   upsample_nearest_2x)

_DEC_CHANNELS = (16, 32, 64, 128, 256)


def _reflect_pad(x: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


class _GudaConv(nn.Module):
    """semconv_guda with two equivalent evaluation modes sharing one
    parameter tree (kernel HWIO + bias, identical to nn.Conv):

      full:  resize -> concat -> one 240-deep 3x3 conv at full res (the
             reference formulation; eval/teacher paths).
      block: the same function in BLOCK-PHASE space
             (ops/guda_fusion.guda_fused_semconv_blockspace) — per-scale
             phase convs on the small grids, no full-resolution
             240-channel intermediates; returns
             (B, H/blk, W/blk, blk, blk, C). depth_to_space of it equals
             the full mode exactly; per-pixel consumers (softmax + CE,
             argmax) run in this view (training loss paths).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 out_res: tuple[int, int], mode: str = "full"):
        from codeps_tpu.ops.guda_fusion import (
            guda_fused_semconv_blockspace)
        cin = sum(f.shape[-1] for f in feats)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        feats = tuple(f.astype(self.dtype) for f in feats)
        kernel = kernel.astype(self.dtype)
        if mode == "block":
            z6 = guda_fused_semconv_blockspace(feats, kernel, out_res)
            return z6 + bias.astype(self.dtype)
        upsampled = [resize_bilinear(f, out_res) for f in feats]
        feat_cat = jnp.concatenate(upsampled, axis=-1)
        out = jax.lax.conv_general_dilated(
            feat_cat, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + bias.astype(self.dtype)


class _ConvELU(nn.Module):
    """3x3 conv + ELU with zero or reflect padding."""
    features: int
    reflect: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.reflect:
            x = _reflect_pad(x)
            pad = "VALID"
        else:
            pad = [(1, 1), (1, 1)]
        x = nn.Conv(self.features, (3, 3), padding=pad, dtype=self.dtype,
                    name="conv")(x)
        return nn.elu(x)


class _ConvParams(nn.Module):
    """Bare 3x3 conv parameters with nn.Conv's tree layout/initializers,
    for paths that consume the kernel through the phase machinery."""
    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, self.in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class _PhaseConvELU(nn.Module):
    """upsample_nearest_2x -> zero-padded conv3x3 -> ELU, computed in
    BLOCK-PHASE space on the small grid (no full-resolution
    intermediate; 4x output-lane packing). Param tree identical to
    _ConvELU; depth_to_space of the output equals the full-res
    formulation exactly (ops/guda_fusion.upsample_conv3x3_blockspace).

    Parity: the reference decoder tails' upsample+conv stage
    (models/depth_head.py:64-70, models/semantic_head.py:48-54).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from codeps_tpu.ops.guda_fusion import upsample_conv3x3_blockspace
        kernel, bias = _ConvParams(self.features, x.shape[-1],
                                   name="conv")()
        z = upsample_conv3x3_blockspace(
            x, kernel.astype(self.dtype), 2, mode="nearest")
        return nn.elu(z + bias.astype(self.dtype))


class _BlockConv3x3(nn.Module):
    """Full-resolution 3x3 conv applied to a block-phase-view tensor
    (ops/guda_fusion.blockspace_conv3x3) — exact, with nn.Conv's param
    tree. ``pad`` is the full-resolution padding semantics."""
    features: int
    pad: str = "zero"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        from codeps_tpu.ops.guda_fusion import blockspace_conv3x3
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, z.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        out = blockspace_conv3x3(z, kernel.astype(self.dtype),
                                 pad=self.pad)
        return out + bias.astype(self.dtype)


def disp_to_depth(disp: jnp.ndarray, min_depth: float = 0.1,
                  max_depth: float = 100.0) -> jnp.ndarray:
    """Sigmoid disparity -> depth in [min_depth, max_depth].

    Parity: DepthHead.disp_to_depth (models/depth_head.py:48-54).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return 1.0 / scaled_disp


class DepthHead(nn.Module):
    """Monodepth2-style decoder with skips; sigmoid disparity at 4 scales.

    Parity: models/depth_head.py:10-78. Only the full-resolution scale-0
    disparity feeds anything downstream (depth_head.py:73-74); the coarser
    dispconvs exist in the reference but their outputs are unused, so we
    trace only scale 0 (XLA would DCE the rest anyway).
    """
    num_ch_enc: Sequence[int]
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feats: Sequence[jnp.ndarray]):
        from codeps_tpu.ops.guda_fusion import depth_to_space
        x = in_feats[-1].astype(self.dtype)
        for i in range(4, 0, -1):
            x = _ConvELU(_DEC_CHANNELS[i], dtype=self.dtype,
                         name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if self.use_skips:
                x = jnp.concatenate([x, in_feats[i - 1].astype(self.dtype)],
                                    axis=-1)
            x = _ConvELU(_DEC_CHANNELS[i], dtype=self.dtype,
                         name=f"upconv_{i}_1")(x)

        # full-resolution tail in block-phase space: nearest-2x +
        # upconv_0_1 as a half-grid phase conv, dispconv as a
        # block-space conv — exact, and only the 1-channel disparity is
        # ever materialized at full resolution (models/depth_head.py:64-74)
        x = _ConvELU(_DEC_CHANNELS[0], dtype=self.dtype,
                     name="upconv_0_0")(x)
        z = _PhaseConvELU(_DEC_CHANNELS[0], dtype=self.dtype,
                          name="upconv_0_1")(x)
        disp6 = _BlockConv3x3(1, pad="reflect", dtype=self.dtype,
                              name="dispconv_0")(z)
        disp = nn.sigmoid(depth_to_space(disp6, 2).astype(jnp.float32))
        depth = disp_to_depth(disp)
        return depth, disp


class PoseHead(nn.Module):
    """Squeeze + 3 convs + spatial mean -> 0.01x (axis-angle, translation)
    -> 4x4 SE(3). Parity: models/pose_head.py:14-54.

    The reference is constructed with num_frames_to_predict_for=2
    (codeps/model_setup.py:59-61): the final conv emits 6*2 channels but
    only the first frame's 6 parameters feed the transform
    (pose_head.py:46-53). Replicated for checkpoint-shape parity.
    """
    num_frames_to_predict_for: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feats: Sequence[jnp.ndarray],
                 invert_pose: bool = False) -> jnp.ndarray:
        x = in_feats[-1].astype(self.dtype)
        x = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype,
                            name="squeeze")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="pose_0")(x))
        x = nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="pose_1")(x))
        x = nn.Conv(6 * self.num_frames_to_predict_for, (1, 1),
                    dtype=self.dtype, name="pose_2")(x)

        out = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        out = 0.01 * out
        axisangle = out[:, :3]
        translation = out[:, 3:6]
        return transformation_from_parameters(axisangle, translation,
                                              invert=invert_pose)


class FlowHead(nn.Module):
    """Object-motion (masked scene-flow) decoder.

    Parity: models/flow_head.py:6-79 — reflect-padded convs, bilinear
    align_corners=True 2x upsampling, 0.001-scaled ELU output, auto-mask
    zeroing sub-mean-norm motion.
    """
    num_ch_enc: Sequence[int]
    use_skips: bool = True
    auto_mask: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        x = in_feats[-1].astype(self.dtype)
        for i in range(4, -1, -1):
            x = _ConvELU(_DEC_CHANNELS[i], reflect=True, dtype=self.dtype,
                         name=f"upconv_{i}_0")(x)
            x = upsample_bilinear_2x_align(x)
            if i > 0:
                if self.use_skips:
                    x = jnp.concatenate(
                        [x, in_feats[i - 1].astype(self.dtype)], axis=-1)
                x = _ConvELU(_DEC_CHANNELS[i], reflect=True,
                             dtype=self.dtype, name=f"upconv_{i}_1")(x)

        x = _ConvELU(3, reflect=True, dtype=self.dtype,
                     name="translation")(x)
        flow = 0.001 * x.astype(jnp.float32)

        if self.auto_mask:
            # models/flow_head.py:70-79: zero out pixels whose motion norm
            # is below the batch-global mean norm.
            sq = jnp.sqrt(jnp.sum(flow * flow, axis=-1, keepdims=True))
            mean_sq = jnp.mean(sq)
            flow = flow * (sq > mean_sq).astype(flow.dtype)
        return flow


class SemanticHead(nn.Module):
    """Depth-decoder-mirror semantic head, optional GUDA multi-scale fusion.

    Parity: models/semantic_head.py:8-76. Output is **softmax
    probabilities** (not raw logits) — the reference feeds these into a CE
    loss that applies log_softmax again; the loss side replicates that.
    """
    num_ch_enc: Sequence[int]
    num_classes: int
    use_skips: bool = True
    use_guda_fusion: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, in_feats: Sequence[jnp.ndarray],
                 phase_space: bool = False) -> jnp.ndarray:
        """``phase_space=True`` (GUDA fusion only) returns the softmax
        probabilities in the block-phase view
        (B, H/blk, W/blk, blk, blk, num_classes) — the same pixel set
        (depth_to_space recovers the full map), computed without any
        full-resolution activation (see _GudaConv). Values match the
        full path exactly in f32; under a bf16 compute dtype this view
        additionally keeps the softmax in bf16 (the full path softmaxes
        in f32), a documented loss-dtype-policy deviation. Training loss
        paths use it; eval/teacher keep the full-resolution output.
        A phase variant that d2s'ed back to full resolution measured
        SLOWER than the reference formulation (3.24 -> 2.98 steps/s,
        r3 bench) — the win requires consumers to stay in this view."""
        feat = in_feats[-1].astype(self.dtype)
        guda_mem = []
        for i in range(4, -1, -1):
            feat = _ConvELU(_DEC_CHANNELS[i], dtype=self.dtype,
                            name=f"upconv_{i}_0")(feat)
            if i == 0 and phase_space:
                # full-res stage in block-phase space (exact; the GUDA
                # conv consumes the 6-d view via blockspace_conv3x3)
                feat = _PhaseConvELU(_DEC_CHANNELS[0], dtype=self.dtype,
                                     name="upconv_0_1")(feat)
                guda_mem.append(feat)
                continue
            feat = upsample_nearest_2x(feat)
            if self.use_skips and i > 0:
                feat = jnp.concatenate(
                    [feat, in_feats[i - 1].astype(self.dtype)], axis=-1)
            feat = _ConvELU(_DEC_CHANNELS[i], dtype=self.dtype,
                            name=f"upconv_{i}_1")(feat)
            if i < 4 and self.use_guda_fusion:
                guda_mem.append(feat)

        if self.use_guda_fusion:
            last = guda_mem[-1]
            out_res = ((last.shape[1] * 2, last.shape[2] * 2)
                       if last.ndim == 6 else last.shape[1:3])
            sem = _GudaConv(self.num_classes, dtype=self.dtype,
                            name="semconv_guda")(
                guda_mem, out_res,
                mode="block" if phase_space else "full")
        else:
            assert not phase_space, (
                "phase_space output requires use_guda_fusion")
            sem = nn.Conv(self.num_classes, (3, 3), padding="VALID",
                          dtype=self.dtype,
                          name="semconv")(_reflect_pad(feat))

        if phase_space:
            # training-only view: stay in the compute dtype (the CE
            # casts per the loss dtype policy anyway; materializing the
            # f32 block-phase softmax costs a measurable extra pass)
            return jax.nn.softmax(sem, axis=-1)
        return jax.nn.softmax(sem.astype(jnp.float32), axis=-1)


class _DepthwiseSeparable(nn.Module):
    """5x5 depthwise + BN + ReLU + 1x1 pointwise + BN + ReLU."""
    features: int
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (5, 5), padding=[(2, 2), (2, 2)],
                    feature_group_count=in_ch, use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None,
                         name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None,
                         name="bn2")(x)
        return nn.relu(x)


class _InstanceDecoder(nn.Module):
    """Panoptic-DeepLab shared decoder (models/instance_head.py:10-71)."""
    num_ch_enc: Sequence[int]
    dtype: Any = jnp.float32
    axis_name: str | None = None

    NUM_CH_PROJECT = (64, 32, 16)
    NUM_CH_DEC = (256, 128, 128)

    @nn.compact
    def __call__(self, in_feats: Sequence[jnp.ndarray], train: bool):
        feat = in_feats[-1].astype(self.dtype)
        feat = nn.Conv(self.NUM_CH_DEC[0], (1, 1), use_bias=False,
                       dtype=self.dtype, name="conv")(feat)
        for i in range(3):
            skip = in_feats[-(i + 2)].astype(self.dtype)
            skip = nn.Conv(self.NUM_CH_PROJECT[i], (1, 1), use_bias=False,
                           dtype=self.dtype, name=f"project_{i}_conv")(skip)
            skip = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype,
                                axis_name=self.axis_name if train else None,
                                name=f"project_{i}_bn")(skip)
            skip = nn.relu(skip)
            feat = resize_bilinear(feat, skip.shape[1:3], align_corners=True)
            feat = jnp.concatenate([feat, skip], axis=-1)
            feat = _DepthwiseSeparable(self.NUM_CH_DEC[i], dtype=self.dtype,
                                       axis_name=self.axis_name,
                                       name=f"fuse_{i}")(feat, train)
        return feat


class _InstanceSubHead(nn.Module):
    """Upsample 2x -> depthwise separable -> upsample 2x -> 1x1 conv
    (models/instance_head.py:77-120)."""
    num_classes: int
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = upsample_bilinear_2x_align(x)
        x = _DepthwiseSeparable(32, dtype=self.dtype,
                                axis_name=self.axis_name,
                                name="depth_conv")(x, train)
        # 1x1 conv commutes with the (row-stochastic) bilinear
        # upsample: conv first, then upsample the 1-2ch output — the
        # 32-channel full-res intermediate of the reference formulation
        # (instance_head.py:116-120) never materializes.
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    name="conv")(x)
        return upsample_bilinear_2x_align(x)


class InstanceHead(nn.Module):
    """Panoptic-DeepLab instance head: center + offset (+ thing mask).

    Parity: models/instance_head.py:126-161.
    """
    num_ch_enc: Sequence[int]
    use_thing_mask: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, in_feats: Sequence[jnp.ndarray], train: bool = False):
        feats = _InstanceDecoder(self.num_ch_enc, dtype=self.dtype,
                                 axis_name=self.axis_name,
                                 name="decoder")(in_feats, train)
        center = _InstanceSubHead(1, dtype=self.dtype,
                                  axis_name=self.axis_name,
                                  name="center_head")(feats, train)
        offset = _InstanceSubHead(2, dtype=self.dtype,
                                  axis_name=self.axis_name,
                                  name="offset_head")(feats, train)
        center = center.astype(jnp.float32)
        offset = offset.astype(jnp.float32)
        if self.use_thing_mask:
            logits = _InstanceSubHead(2, dtype=self.dtype,
                                      axis_name=self.axis_name,
                                      name="thing_mask_head")(feats, train)
            thing_mask = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        else:
            thing_mask = None
        return center, offset, thing_mask
