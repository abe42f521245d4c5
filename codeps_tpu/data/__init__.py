from codeps_tpu.data import labels
from codeps_tpu.data.labels import (get_labels, num_classes, stuff_classes,
                                    thing_classes)


def __getattr__(name):
    # Lazy imports: the dataset modules pull in cv2/PIL, which not every
    # consumer of codeps_tpu.data.labels needs.
    if name == "Cityscapes":
        from codeps_tpu.data.cityscapes import Cityscapes
        return Cityscapes
    if name == "Kitti360":
        from codeps_tpu.data.kitti_360 import Kitti360
        return Kitti360
    if name == "SemKittiDvps":
        from codeps_tpu.data.sem_kitti_dvps import SemKittiDvps
        return SemKittiDvps
    if name == "DataLoader":
        from codeps_tpu.data.loader import DataLoader
        return DataLoader
    if name == "collate_batch":
        from codeps_tpu.data.loader import collate_batch
        return collate_batch
    raise AttributeError(name)


__all__ = ["labels", "get_labels", "num_classes", "stuff_classes",
           "thing_classes", "Cityscapes", "Kitti360", "SemKittiDvps",
           "DataLoader", "collate_batch"]
