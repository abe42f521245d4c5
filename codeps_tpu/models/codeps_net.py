"""Model composition: build and initialize all CoDEPS modules.

Capability parity with gen_models (/root/reference/codeps/model_setup.py:30-147)
and the module granularity of CodepsNet
(/root/reference/codeps/online_adap.py:438-455): parameters live in a dict
keyed by module name — ``backbone_po_depth, backbone_pose_sflow, depth_head,
pose_head, flow_head, semantic_head, instance_head`` — so checkpoints,
freezing masks, and EMA masks address the same units as the reference.

Unlike the reference's nn.Module facade, the forward orchestration lives in
pure functions (codeps_tpu/tasks/forward.py) over these params — the natural
shape for jit/grad/shard_map.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from codeps_tpu.models.heads import (DepthHead, FlowHead, InstanceHead,
                                     PoseHead, SemanticHead)
from codeps_tpu.models.resnet import ResNetEncoder, make_encoder

MODULE_NAMES = ("backbone_po_depth", "backbone_pose_sflow", "depth_head",
                "pose_head", "flow_head", "semantic_head", "instance_head")


@dataclasses.dataclass(frozen=True)
class CodepsModules:
    """Static bundle of Flax module definitions (hashable, jit-friendly)."""
    backbone_po_depth: ResNetEncoder
    backbone_pose_sflow: ResNetEncoder | None
    depth_head: DepthHead | None
    pose_head: PoseHead | None
    flow_head: FlowHead | None
    semantic_head: SemanticHead | None
    instance_head: InstanceHead | None
    num_classes: int

    def module_names(self) -> list[str]:
        return [name for name in MODULE_NAMES
                if getattr(self, name) is not None]


def build_modules(cfg, num_classes: int,
                  dtype: Any = jnp.float32,
                  axis_name: str | None = None,
                  remat: bool | tuple | list | None = None) -> CodepsModules:
    """Construct module definitions from a config tree.

    Mirrors gen_models' wiring (codeps/model_setup.py:36-147): the pose
    backbone consumes 2 stacked frames with 4 channels each (RGB-D) iff the
    scene-flow head is enabled, else 3 (model_setup.py:52-57).
    """
    make_depth = cfg.model.make_depth
    make_sflow = cfg.model.make_sflow
    make_semantic = cfg.model.make_semantic
    make_instance = cfg.model.make_instance
    tpu_cfg = cfg.get("tpu", {})
    if remat is None:
        # bool (all stages) or a list of encoder stage numbers in 1..4
        remat = tpu_cfg.get("remat", False) if tpu_cfg else False
    s2d_conv1 = tpu_cfg.get("s2d_conv1", False) if tpu_cfg else False

    backbone = make_encoder(cfg.model.po_depth_net.params.nof_layers,
                            dtype=dtype, axis_name=axis_name, remat=remat,
                            s2d_conv1=s2d_conv1)
    num_ch_enc = backbone.num_ch_enc

    backbone_pose = None
    depth_head = None
    pose_head = None
    flow_head = None
    if make_depth:
        channels = 4 if make_sflow else 3
        backbone_pose = make_encoder(
            cfg.model.pose_sflow_net.params.nof_layers,
            num_input_images=2, num_channels_input=channels,
            dtype=dtype, axis_name=axis_name, remat=remat,
            s2d_conv1=s2d_conv1)
        depth_head = DepthHead(num_ch_enc=tuple(num_ch_enc), use_skips=True,
                               dtype=dtype)
        pose_head = PoseHead(dtype=dtype)
        if make_sflow:
            flow_head = FlowHead(num_ch_enc=tuple(backbone_pose.num_ch_enc),
                                 dtype=dtype)

    semantic_head = None
    if make_semantic:
        semantic_head = SemanticHead(
            num_ch_enc=tuple(num_ch_enc), num_classes=num_classes,
            use_skips=True,
            use_guda_fusion=cfg.model.semantic_head.use_guda_fusion,
            dtype=dtype)

    instance_head = None
    if make_instance:
        instance_head = InstanceHead(
            num_ch_enc=tuple(num_ch_enc),
            use_thing_mask=cfg.model.instance_head.use_thing_mask,
            dtype=dtype, axis_name=axis_name)

    return CodepsModules(
        backbone_po_depth=backbone,
        backbone_pose_sflow=backbone_pose,
        depth_head=depth_head,
        pose_head=pose_head,
        flow_head=flow_head,
        semantic_head=semantic_head,
        instance_head=instance_head,
        num_classes=num_classes,
    )


def init_params(rng: jax.Array, modules: CodepsModules,
                image_size: tuple[int, int]) -> tuple[Dict, Dict]:
    """Initialize per-module params and batch stats.

    Returns (params, batch_stats), each a dict keyed by module name.
    """
    height, width = image_size

    # One jitted program for the whole init: unjitted flax init dispatches
    # thousands of tiny ops (100+ seconds on a slow host); fused it is
    # a single compile.
    def _init(rng):
        dummy = jnp.zeros((1, height, width, 3), jnp.float32)
        keys = jax.random.split(rng, 8)

        params: Dict[str, Any] = {}
        stats: Dict[str, Any] = {}

        variables = modules.backbone_po_depth.init(keys[0], dummy,
                                                   train=False)
        params["backbone_po_depth"] = variables["params"]
        stats["backbone_po_depth"] = variables.get("batch_stats", {})
        feats = modules.backbone_po_depth.apply(variables, dummy,
                                                train=False)

        if modules.backbone_pose_sflow is not None:
            channels = 2 * modules.backbone_pose_sflow.num_channels_input
            dummy_pose = jnp.zeros((1, height, width, channels), jnp.float32)
            variables = modules.backbone_pose_sflow.init(keys[1], dummy_pose,
                                                         train=False)
            params["backbone_pose_sflow"] = variables["params"]
            stats["backbone_pose_sflow"] = variables.get("batch_stats", {})
            pose_feats = modules.backbone_pose_sflow.apply(
                variables, dummy_pose, train=False)

        if modules.depth_head is not None:
            params["depth_head"] = modules.depth_head.init(
                keys[2], feats)["params"]
        if modules.pose_head is not None:
            params["pose_head"] = modules.pose_head.init(
                keys[3], pose_feats)["params"]
        if modules.flow_head is not None:
            params["flow_head"] = modules.flow_head.init(
                keys[4], pose_feats)["params"]
        if modules.semantic_head is not None:
            params["semantic_head"] = modules.semantic_head.init(
                keys[5], feats)["params"]
        if modules.instance_head is not None:
            variables = modules.instance_head.init(keys[6], feats,
                                                   train=False)
            params["instance_head"] = variables["params"]
            stats["instance_head"] = variables.get("batch_stats", {})

        return params, stats

    return jax.jit(_init)(rng)


def param_count(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
