from codeps_tpu.evaluation.depth_metrics import (
    METRIC_KEYS, compute_depth_metrics, compute_depth_metrics_per_class)
from codeps_tpu.evaluation.semantic_metrics import (compute_confusion_matrix,
                                                    compute_sem_miou)
from codeps_tpu.evaluation.panoptic_metrics import (PanopticEvaluator, PQStat,
                                                    PQStatCat,
                                                    compute_panoptic_stats)
from codeps_tpu.evaluation.meters import (AverageMeter, ConfusionMatrixMeter,
                                          ConstantMeter, Meter, PanopticMeter)

__all__ = [
    "METRIC_KEYS", "compute_depth_metrics",
    "compute_depth_metrics_per_class", "compute_confusion_matrix",
    "compute_sem_miou", "PanopticEvaluator", "PQStat", "PQStatCat",
    "compute_panoptic_stats", "AverageMeter", "ConfusionMatrixMeter",
    "ConstantMeter", "Meter", "PanopticMeter",
]
