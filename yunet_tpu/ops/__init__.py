from .priors import grid_priors
from .boxes import (bbox_decode, kps_decode, kps_encode, pairwise_iou,
                    fuse_score)
from .nms import device_nms
from .losses import (bce_with_logits, smooth_l1, eiou)
from .assign import sim_ota_assign

__all__ = [
    "grid_priors", "bbox_decode", "kps_decode", "kps_encode",
    "pairwise_iou", "fuse_score", "device_nms", "bce_with_logits",
    "smooth_l1", "eiou", "sim_ota_assign",
]
