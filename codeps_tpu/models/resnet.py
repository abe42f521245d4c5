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


class _ConvBN(nn.Module):
    """Conv (no bias) + BatchNorm, torch eps/momentum."""
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool):
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
                    name="conv1")(x, train)
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
                 remat: bool | tuple | list = False) -> ResNetEncoder:
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
                         dtype=dtype, axis_name=axis_name, remat=remat)
