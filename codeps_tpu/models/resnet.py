"""ResNet encoder backbone (Flax).

Capability parity with ResnetEncoder / ResNetMultiImageInput
(/root/reference/models/resnet_encoder.py:19-126): torchvision-v1.5-style
ResNet-{18,34,50,101,152}, returning the 5-level feature pyramid
[conv1+relu, layer1..layer4] with channels [64,64,128,256,512] (x4 from
layer1 up for Bottleneck variants). Multi-image / RGB-D input widths are
supported via ``num_input_images`` / ``num_channels_input``; pretrained
conv1 kernels are adapted by channel-mean + stacking in the checkpoint
converter (codeps_tpu/io/convert_pth.py), mirroring resnet_encoder.py:66-76.

TPU notes: NHWC layout; convs run in ``dtype`` (bfloat16 by default at the
call site) with float32 params and batch stats. BatchNorm takes an optional
``axis_name`` for cross-replica (SyncBN-parity) statistics.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_STAGES = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}

_KERNEL_INIT = nn.initializers.variance_scaling(2.0, "fan_out",
                                                "truncated_normal")


class _Conv1Kernel(nn.Module):
    """Bare (7,7,C,F) conv kernel param, path-compatible with nn.Conv
    (module name 'conv', param name 'kernel') so checkpoints/freeze
    masks/EMA see the identical tree whether or not the space-to-depth
    execution path is active."""
    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", _KERNEL_INIT,
                          (7, 7, self.in_ch, self.features))


def _fold_conv1_s2d(kernel: jnp.ndarray) -> jnp.ndarray:
    """Fold a (7,7,C,F) stride-2 kernel into the (4,4,4C,F) kernel of the
    equivalent stride-1 conv over the 2x2 space-to-depth input.

    Derivation: with input row r = 2*oy + ky - 3 (pad 3) written as
    r = 2u + py, the kernel tap is ky = 2a + py - 1 for block row
    a = u - oy + 2 in [0,4) — i.e. the folded kernel is the 7x7 kernel
    front-padded by one zero row/col and regrouped by (block, phase).
    Same multiply-add terms as the original conv (summation order
    aside); the classic TPU conv1 rewrite (small-C stride-2 7x7 convs
    under-utilize MXU tiling; 4C channels at stride 1 tile cleanly).
    """
    c_in, feats = kernel.shape[2], kernel.shape[3]
    k = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k = k.reshape(4, 2, 4, 2, c_in, feats).transpose(0, 2, 1, 3, 4, 5)
    return k.reshape(4, 4, 4 * c_in, feats)


class _ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torch eps/momentum.

    ``s2d`` (7x7/stride-2 convs only): execute via the space-to-depth
    fold above — exact up to float summation order, equality-tested in
    tests/test_models.py.
    """
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    axis_name: str | None = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        if (self.s2d and self.kernel == 7 and self.stride == 2
                and self.groups == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            kernel = _Conv1Kernel(self.features, x.shape[-1],
                                  name="conv")()
            b, h, w, c = x.shape
            xs = x.reshape(b, h // 2, 2, w // 2, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, h // 2, w // 2, 4 * c)
            x = jax.lax.conv_general_dilated(
                xs.astype(self.dtype),
                _fold_conv1_s2d(kernel).astype(self.dtype),
                window_strides=(1, 1), padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            pad = (self.kernel - 1) // 2
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        strides=(self.stride, self.stride),
                        padding=[(pad, pad), (pad, pad)],
                        feature_group_count=self.groups,
                        use_bias=False, dtype=self.dtype,
                        kernel_init=_KERNEL_INIT, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         axis_name=self.axis_name if train else None,
                         name="bn")(x)
        return x


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                      axis_name=self.axis_name, name="conv1")(x, train)
        out = nn.relu(out)
        out = _ConvBN(self.features, 3, 1, dtype=self.dtype,
                      axis_name=self.axis_name, name="conv2")(out, train)
        if self.downsample:
            identity = _ConvBN(self.features, 1, self.stride,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name="downsample")(x, train)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.features, 1, 1, dtype=self.dtype,
                      axis_name=self.axis_name, name="conv1")(x, train)
        out = nn.relu(out)
        # torchvision v1.5 puts the stride on the 3x3 conv.
        out = _ConvBN(self.features, 3, self.stride, dtype=self.dtype,
                      axis_name=self.axis_name, name="conv2")(out, train)
        out = nn.relu(out)
        out = _ConvBN(self.features * 4, 1, 1, dtype=self.dtype,
                      axis_name=self.axis_name, name="conv3")(out, train)
        if self.downsample:
            identity = _ConvBN(self.features * 4, 1, self.stride,
                               dtype=self.dtype, axis_name=self.axis_name,
                               name="downsample")(x, train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """Multi-scale feature encoder.

    Attributes:
      num_layers: one of 18/34/50/101/152.
      num_input_images: stacked frames (pose net uses 2).
      num_channels_input: channels per frame (4 for RGB-D when sflow is on).
    """
    num_layers: int = 18
    num_input_images: int = 1
    num_channels_input: int = 3
    dtype: Any = jnp.float32
    axis_name: str | None = None
    # Rematerialize residual blocks in the backward pass: trades ~33%
    # extra forward FLOPs for O(depth) less activation memory — used
    # to fit the train_cityscapes shape (batch 6 x 512x1024, ResNet-101
    # fwd+bwd) into a 16 GB v5e chip. Either a bool (all stages) or a
    # tuple of stage numbers in 1..4 (remat only those stages): the
    # early high-resolution stages hold most of the activation bytes,
    # so remat=(1, 2) buys most of the memory for a fraction of the
    # recompute FLOPs.
    remat: bool | tuple = False
    # Execute conv1 via the space-to-depth fold (_fold_conv1_s2d): exact
    # up to summation order, same param tree. Default OFF — A/B'd on the
    # v5e adapt step (384x1280) and REGRESSED 4.43 -> 4.25 steps/s: the
    # full-res s2d transpose is itself a layout copy and the folded
    # kernel carries +30% structural-zero FLOPs, which together exceed
    # what the denser channel tiling buys at this shape. Kept as an
    # equality-tested opt-in (cfg.tpu.s2d_conv1 / BENCH_S2D) for shapes
    # where conv1 is a bigger share (deep-C pretrain feeds).
    s2d_conv1: bool = False

    @property
    def num_ch_enc(self) -> np.ndarray:
        chans = np.array([64, 64, 128, 256, 512])
        if self.num_layers > 34:
            chans[1:] *= 4
        return chans

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> list[jnp.ndarray]:
        block_kind, stage_sizes = _STAGES[self.num_layers]
        block = _BasicBlock if block_kind == "basic" else _Bottleneck
        if self.remat is True:
            remat_stages = (1, 2, 3, 4)
        elif self.remat:
            remat_stages = tuple(int(s) for s in self.remat)
        else:
            remat_stages = ()
        if remat_stages:
            # static_argnums: (self, x, train) -> train at index 2
            remat_block = nn.remat(block, static_argnums=(2,))
        expansion = 1 if block_kind == "basic" else 4

        x = x.astype(self.dtype)
        features = []

        x = _ConvBN(64, 7, 2, dtype=self.dtype, axis_name=self.axis_name,
                    s2d=self.s2d_conv1, name="conv1")(x, train)
        x = nn.relu(x)
        features.append(x)

        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)])

        in_planes = 64
        for stage, num_blocks in enumerate(stage_sizes):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            stage_block = (remat_block if (stage + 1) in remat_stages
                           else block)
            for i in range(num_blocks):
                blk_stride = stride if i == 0 else 1
                needs_down = (i == 0 and
                              (blk_stride != 1 or
                               in_planes != planes * expansion))
                x = stage_block(planes, blk_stride, needs_down,
                                dtype=self.dtype,
                                axis_name=self.axis_name,
                                name=f"layer{stage + 1}_{i}")(x, train)
                in_planes = planes * expansion
            features.append(x)

        return features


def make_encoder(num_layers: int, num_input_images: int = 1,
                 num_channels_input: int = 3, dtype: Any = jnp.float32,
                 axis_name: str | None = None,
                 remat: bool | tuple | list = False,
                 s2d_conv1: bool = False) -> ResNetEncoder:
    assert num_layers in _STAGES, f"Unsupported ResNet depth: {num_layers}"
    if num_input_images > 1 or num_channels_input != 3:
        # Reference restricts multi-image encoders to 18/50
        # (models/resnet_encoder.py:54); we keep the same contract.
        assert num_layers in (18, 50), \
            "Multi-image input requires ResNet-18 or ResNet-50"
    if not isinstance(remat, bool):
        remat = tuple(int(s) for s in remat)
    return ResNetEncoder(num_layers=num_layers,
                         num_input_images=num_input_images,
                         num_channels_input=num_channels_input,
                         dtype=dtype, axis_name=axis_name, remat=remat,
                         s2d_conv1=s2d_conv1)
