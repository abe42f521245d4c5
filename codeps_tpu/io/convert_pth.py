"""Convert reference PyTorch checkpoints (.pth) to Flax parameter trees.

The reference checkpoint stores one torch state_dict per module name
(io_utils/io_utils.py:76-88; module list codeps/online_adap.py:438-455).
This converter maps each module's torch parameter names/layouts onto the
Flax trees produced by codeps_tpu.models:

  torch Conv2d weight (O, I, kh, kw)  -> Flax kernel (kh, kw, I, O)
  torch depthwise (C, 1, kh, kw)      -> Flax kernel (kh, kw, 1, C)
  torch BatchNorm weight/bias         -> Flax bn scale/bias (params)
  torch running_mean/var              -> Flax bn mean/var (batch_stats)

Multi-image conv1 adaptation for pretrained ImageNet weights (channel-mean
stacking) mirrors resnet_multiimage_input
(/root/reference/models/resnet_encoder.py:66-76).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Array = np.ndarray
Tree = Dict[str, Any]


def _conv_w(weight: Array) -> Array:
    return np.ascontiguousarray(np.transpose(weight, (2, 3, 1, 0)))


def _set(tree: Tree, path: Tuple[str, ...], value: Array) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _as_numpy(state: Mapping[str, Any]) -> Dict[str, Array]:
    out = {}
    for key, value in state.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        out[key] = np.asarray(value)
    return out


def _convert_bn(state, prefix: str, params: Tree, stats: Tree,
                path: Tuple[str, ...]) -> None:
    _set(params, path + ("scale",), state[f"{prefix}.weight"])
    _set(params, path + ("bias",), state[f"{prefix}.bias"])
    _set(stats, path + ("mean",), state[f"{prefix}.running_mean"])
    _set(stats, path + ("var",), state[f"{prefix}.running_var"])


# --------------------------------------------------------------- encoder

def convert_resnet_encoder(state: Mapping[str, Any],
                           num_layers: int) -> Tuple[Tree, Tree]:
    """ResnetEncoder state_dict (keys 'encoder.*') -> (params, batch_stats)."""
    state = _as_numpy(state)
    params: Tree = {}
    stats: Tree = {}

    _set(params, ("conv1", "conv", "kernel"), _conv_w(state["encoder.conv1.weight"]))
    _convert_bn(state, "encoder.bn1", params, stats, ("conv1", "bn"))

    stage_sizes = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                   101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[num_layers]
    bottleneck = num_layers > 34
    convs_per_block = 3 if bottleneck else 2

    for stage, num_blocks in enumerate(stage_sizes):
        for i in range(num_blocks):
            tprefix = f"encoder.layer{stage + 1}.{i}"
            fprefix = f"layer{stage + 1}_{i}"
            for c in range(1, convs_per_block + 1):
                _set(params, (fprefix, f"conv{c}", "conv", "kernel"),
                     _conv_w(state[f"{tprefix}.conv{c}.weight"]))
                _convert_bn(state, f"{tprefix}.bn{c}", params, stats,
                            (fprefix, f"conv{c}", "bn"))
            if f"{tprefix}.downsample.0.weight" in state:
                _set(params, (fprefix, "downsample", "conv", "kernel"),
                     _conv_w(state[f"{tprefix}.downsample.0.weight"]))
                _convert_bn(state, f"{tprefix}.downsample.1", params, stats,
                            (fprefix, "downsample", "bn"))
    return params, stats


def adapt_conv1_multi_input(conv1_kernel: Array, num_input_images: int,
                            num_channels_input: int) -> Array:
    """Widen an ImageNet conv1 kernel (kh, kw, 3, 64) for stacked/RGB-D input.

    Parity: resnet_multiimage_input (models/resnet_encoder.py:66-76):
    extra channels get the RGB mean, then the block repeats per input image
    and is divided by the image count.
    """
    kh, kw, _, out = conv1_kernel.shape
    if num_channels_input > 3:
        mean = conv1_kernel.mean(axis=2, keepdims=True)
        extra = np.repeat(mean, num_channels_input - 3, axis=2)
        block = np.concatenate([conv1_kernel, extra], axis=2)
    else:
        block = conv1_kernel
    stacked = np.concatenate([block] * num_input_images, axis=2)
    return stacked / num_input_images


# ----------------------------------------------------------------- heads

def convert_depth_head(state: Mapping[str, Any]) -> Tree:
    state = _as_numpy(state)
    params: Tree = {}
    for i in range(5):
        for j in range(2):
            key = f"upconvs_{j}.{i}.0"
            _set(params, (f"upconv_{i}_{j}", "conv", "kernel"),
                 _conv_w(state[f"{key}.weight"]))
            _set(params, (f"upconv_{i}_{j}", "conv", "bias"),
                 state[f"{key}.bias"])
    # Only dispconv 0 is traced (coarser scales are unused in the
    # reference forward too — models/depth_head.py:73-74).
    _set(params, ("dispconv_0", "kernel"), _conv_w(state["dispconvs.0.1.weight"]))
    _set(params, ("dispconv_0", "bias"), state["dispconvs.0.1.bias"])
    return params


def convert_pose_head(state: Mapping[str, Any]) -> Tree:
    state = _as_numpy(state)
    params: Tree = {}
    names = ["squeeze", "pose_0", "pose_1", "pose_2"]
    for idx, name in enumerate(names):
        _set(params, (name, "kernel"), _conv_w(state[f"net.{idx}.weight"]))
        _set(params, (name, "bias"), state[f"net.{idx}.bias"])
    return params


def convert_flow_head(state: Mapping[str, Any]) -> Tree:
    state = _as_numpy(state)
    params: Tree = {}
    for i in range(5):
        _set(params, (f"upconv_{i}_0", "conv", "kernel"),
             _conv_w(state[f"upconvs_0.{i}.0.weight"]))
        _set(params, (f"upconv_{i}_0", "conv", "bias"),
             state[f"upconvs_0.{i}.0.bias"])
        if i > 0:
            _set(params, (f"upconv_{i}_1", "conv", "kernel"),
                 _conv_w(state[f"upconvs_1.{i}.0.weight"]))
            _set(params, (f"upconv_{i}_1", "conv", "bias"),
                 state[f"upconvs_1.{i}.0.bias"])
    _set(params, ("translation", "conv", "kernel"),
         _conv_w(state["translation_layer.0.weight"]))
    _set(params, ("translation", "conv", "bias"),
         state["translation_layer.0.bias"])
    return params


def convert_semantic_head(state: Mapping[str, Any],
                          use_guda_fusion: bool) -> Tree:
    state = _as_numpy(state)
    params: Tree = {}
    for i in range(5):
        for j in range(2):
            key = f"upconvs_{j}.{i}.0"
            _set(params, (f"upconv_{i}_{j}", "conv", "kernel"),
                 _conv_w(state[f"{key}.weight"]))
            _set(params, (f"upconv_{i}_{j}", "conv", "bias"),
                 state[f"{key}.bias"])
    if use_guda_fusion:
        _set(params, ("semconv_guda", "kernel"),
             _conv_w(state["semconv_guda.weight"]))
        _set(params, ("semconv_guda", "bias"), state["semconv_guda.bias"])
    else:
        _set(params, ("semconv", "kernel"), _conv_w(state["semconv.1.weight"]))
        _set(params, ("semconv", "bias"), state["semconv.1.bias"])
    return params


def _convert_dw_separable(state, tprefix: str, params: Tree, stats: Tree,
                          fpath: Tuple[str, ...]) -> None:
    """torch Sequential [dw conv, bn, relu, pw conv, bn, relu] -> Flax."""
    _set(params, fpath + ("depthwise", "kernel"),
         _conv_w(state[f"{tprefix}.0.weight"]))
    _convert_bn(state, f"{tprefix}.1", params, stats, fpath + ("bn1",))
    _set(params, fpath + ("pointwise", "kernel"),
         _conv_w(state[f"{tprefix}.3.weight"]))
    _convert_bn(state, f"{tprefix}.4", params, stats, fpath + ("bn2",))


def convert_instance_head(state: Mapping[str, Any],
                          use_thing_mask: bool = False) -> Tuple[Tree, Tree]:
    state = _as_numpy(state)
    params: Tree = {}
    stats: Tree = {}

    _set(params, ("decoder", "conv", "kernel"),
         _conv_w(state["decoder.net.conv.0.weight"]))
    for i in range(3):
        _set(params, ("decoder", f"project_{i}_conv", "kernel"),
             _conv_w(state[f"decoder.net.project_{i}.0.weight"]))
        _convert_bn(state, f"decoder.net.project_{i}.1", params, stats,
                    ("decoder", f"project_{i}_bn"))
        _convert_dw_separable(state, f"decoder.net.fuse_{i}", params, stats,
                              ("decoder", f"fuse_{i}"))

    def _sub_head(tname: str, fname: str) -> None:
        _convert_dw_separable(state, f"{tname}.net.depth_conv", params,
                              stats, (fname, "depth_conv"))
        _set(params, (fname, "conv", "kernel"),
             _conv_w(state[f"{tname}.net.conv.weight"]))
        _set(params, (fname, "conv", "bias"), state[f"{tname}.net.conv.bias"])

    _sub_head("center_head", "center_head")
    _sub_head("offset_head", "offset_head")
    if use_thing_mask:
        _sub_head("thing_mask_head.0", "thing_mask_head")
    return params, stats


# ------------------------------------------------------------ checkpoint

def convert_checkpoint(torch_checkpoint: Mapping[str, Any], cfg,
                       num_layers_backbone: int | None = None,
                       num_layers_pose: int | None = None):
    """Convert a full reference checkpoint dict to (params, batch_stats).

    ``torch_checkpoint`` is the loaded ``.pth`` dict with
    ``state_dict: {module_name: torch_state_dict}``
    (io_utils/io_utils.py:76-88).
    """
    state_dicts = torch_checkpoint["state_dict"]
    num_layers_backbone = (num_layers_backbone or
                           cfg.model.po_depth_net.params.nof_layers)
    num_layers_pose = (num_layers_pose or
                       cfg.model.pose_sflow_net.params.nof_layers)

    params: Tree = {}
    stats: Tree = {}

    converters = {
        "backbone_po_depth": lambda sd: convert_resnet_encoder(
            sd, num_layers_backbone),
        "backbone_pose_sflow": lambda sd: convert_resnet_encoder(
            sd, num_layers_pose),
        "depth_head": lambda sd: (convert_depth_head(sd), None),
        "pose_head": lambda sd: (convert_pose_head(sd), None),
        "flow_head": lambda sd: (convert_flow_head(sd), None),
        "semantic_head": lambda sd: (convert_semantic_head(
            sd, cfg.model.semantic_head.use_guda_fusion), None),
        "instance_head": lambda sd: convert_instance_head(
            sd, cfg.model.instance_head.use_thing_mask),
    }
    for name, converter in converters.items():
        sd = state_dicts.get(name)
        if sd is None:
            continue
        p, s = converter(sd)
        params[name] = p
        if s:
            stats[name] = s
    return params, stats
