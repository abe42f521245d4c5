from codeps_tpu.losses.photometric import (photometric_error,
                                           reconstruction_loss,
                                           reconstruction_loss_semantic, ssim)
from codeps_tpu.losses.smoothness import (edge_aware_smoothness_loss,
                                          flow_smoothness_loss,
                                          flow_sparsity_loss)
from codeps_tpu.losses.semantic import (cross_entropy_per_pixel,
                                        semantic_consistency_loss,
                                        semantic_loss)
from codeps_tpu.losses.instance import (binary_mask_loss, center_loss,
                                        ema_consistency_loss, offset_loss)

__all__ = [
    "photometric_error", "reconstruction_loss",
    "reconstruction_loss_semantic", "ssim", "edge_aware_smoothness_loss",
    "flow_smoothness_loss", "flow_sparsity_loss", "cross_entropy_per_pixel",
    "semantic_consistency_loss", "semantic_loss",
    "binary_mask_loss",
    "center_loss", "ema_consistency_loss", "offset_loss",
]
