from codeps_tpu.models.resnet import ResNetEncoder, make_encoder
from codeps_tpu.models.heads import (DepthHead, FlowHead, InstanceHead,
                                     PoseHead, SemanticHead, disp_to_depth)
from codeps_tpu.models.codeps_net import (MODULE_NAMES, CodepsModules,
                                          build_modules, init_params,
                                          param_count)
from codeps_tpu.models.facade import CodepsNet

__all__ = [
    "ResNetEncoder", "make_encoder", "DepthHead", "FlowHead",
    "InstanceHead", "PoseHead", "SemanticHead", "disp_to_depth",
    "MODULE_NAMES", "CodepsModules", "CodepsNet", "build_modules",
    "init_params", "param_count",
]
