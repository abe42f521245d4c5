"""CoDEPS-TPU: a TPU-native framework for online continual learning of
monocular depth estimation and panoptic segmentation.

Re-designed from scratch for JAX/XLA/Pallas on TPU with the capability
surface of the CoDEPS reference (robot-learning-freiburg/CoDEPS):

- Pretraining: supervised panoptic (semantic + instance) + self-supervised
  monocular depth over image triplets, SPMD data-parallel over a device mesh.
- Online adaptation: frame-by-frame stream adaptation with an EMA teacher,
  replay buffer with rare-class + diversity sampling, and cross-domain mixup,
  fused into jit-compiled steps.

Layout:
  config/      config tree + YAML overrides (API-compatible with cfg/*.yaml)
  data/        host-side data pipeline (datasets, labels, replay buffer, mixup)
  geometry/    camera model, pose math, reprojection warping (traced, batched)
  ops/         resize/grid-sample/panoptic post-processing + Pallas kernels
  models/      Flax modules: ResNet encoder + depth/pose/flow/semantic/instance
  losses/      photometric, smoothness, flow, semantic CE, center/offset
  evaluation/  depth metrics, confusion matrix, panoptic quality
  parallel/    mesh + sharding helpers
  tasks/       jitted train / eval / adapt steps over a TrainState pytree
  io/          checkpointing (orbax), .pth conversion, logging
  native/      C++ similarity index for the replay buffer (faiss replacement)
"""

__version__ = "0.1.0"
